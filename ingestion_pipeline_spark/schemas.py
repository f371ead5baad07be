"""Typed schemas for the pipeline's document shapes.

The reference parses CVE JSON with schemaless ``.get()`` chains
(``consumer/consumer.py:80-104``); we declare the consumed core as an
explicit nullable StructType (full-fidelity raw JSON is kept alongside as
a string column). Field paths and citations: FIXTURES.md §3.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)


def _arr(struct: StructType) -> ArrayType:
    return ArrayType(struct, containsNull=True)


# CVE 5.x core — exactly the paths consumed by the reference
# (consumer/consumer.py:80-104, processor.py:49-52).
CVE_CORE_SCHEMA = StructType(
    [
        StructField(
            "cveMetadata",
            StructType(
                [
                    StructField("cveId", StringType()),
                    StructField("datePublished", StringType()),
                    StructField("dateUpdated", StringType()),
                ]
            ),
        ),
        StructField(
            "containers",
            StructType(
                [
                    StructField(
                        "cna",
                        StructType(
                            [
                                StructField("title", StringType()),
                                StructField(
                                    "descriptions",
                                    _arr(StructType([StructField("value", StringType())])),
                                ),
                                StructField(
                                    "metrics",
                                    _arr(
                                        StructType(
                                            [
                                                StructField(
                                                    "cvssV3_1",
                                                    StructType(
                                                        [
                                                            StructField("baseSeverity", StringType()),
                                                            StructField("baseScore", DoubleType()),
                                                        ]
                                                    ),
                                                )
                                            ]
                                        )
                                    ),
                                ),
                                StructField(
                                    "problemTypes",
                                    _arr(
                                        StructType(
                                            [
                                                StructField(
                                                    "descriptions",
                                                    _arr(StructType([StructField("cweId", StringType())])),
                                                )
                                            ]
                                        )
                                    ),
                                ),
                            ]
                        ),
                    )
                ]
            ),
        ),
    ]
)

# NVD REST shape — llama-chatbot/main.py:107-123,148.
NVD_CVE_SCHEMA = StructType(
    [
        StructField(
            "cve",
            StructType(
                [
                    StructField("id", StringType()),
                    StructField(
                        "descriptions",
                        _arr(StructType([StructField("value", StringType())])),
                    ),
                    StructField(
                        "weaknesses",
                        _arr(
                            StructType(
                                [
                                    StructField(
                                        "description",
                                        _arr(StructType([StructField("value", StringType())])),
                                    )
                                ]
                            )
                        ),
                    ),
                    StructField(
                        "metrics",
                        StructType(
                            [
                                StructField(
                                    "cvssMetricV31",
                                    _arr(
                                        StructType(
                                            [
                                                StructField(
                                                    "cvssData",
                                                    StructType(
                                                        [
                                                            StructField("attackVector", StringType()),
                                                            StructField("baseSeverity", StringType()),
                                                            StructField("baseScore", DoubleType()),
                                                        ]
                                                    ),
                                                )
                                            ]
                                        )
                                    ),
                                )
                            ]
                        ),
                    ),
                    StructField(
                        "references",
                        _arr(StructType([StructField("url", StringType())])),
                    ),
                ]
            ),
        )
    ]
)

# Grype vulnerability-match shape — scanner/scan.py:44-45,53-62.
GRYPE_SCHEMA = StructType(
    [
        StructField("image", StringType()),
        StructField(
            "matches",
            _arr(
                StructType(
                    [
                        StructField(
                            "vulnerability",
                            StructType(
                                [
                                    StructField("id", StringType()),
                                    StructField("severity", StringType()),
                                ]
                            ),
                        )
                    ]
                )
            ),
        ),
    ]
)

# Flat embedding-metadata record — consumer/consumer.py:92-104.
EMBED_METADATA_SCHEMA = StructType(
    [
        StructField("cve_id", StringType()),
        StructField("published_date", StringType()),
        StructField("updated_date", StringType()),
        StructField("severity", StringType()),
        StructField("score", DoubleType()),
        StructField("cwe_id", StringType()),
    ]
)
