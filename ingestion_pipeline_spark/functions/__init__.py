from . import exact, extract, text, vector, scoring  # noqa: F401
