from .parser import And, Expr, Literal, Or, parse_query  # noqa: F401
