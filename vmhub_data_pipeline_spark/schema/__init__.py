from .spec import compile_schema, compile_field, conform  # noqa: F401
