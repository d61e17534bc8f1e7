"""DRL — the reference's retrieval sublanguage, compiled to DataFrames.

Pipeline mirrors the reference's query lifecycle (SURVEY §3.1) with Spark
replacing the generator machinery:

    sexp text --parse--> AST --gate--> (finiteness check) --compile--> DataFrame

The DataFrame *is* the physical plan: Catalyst analyzes/optimizes what the
reference executed verbatim (it has no optimizer — SURVEY §4.1).
"""

from sakura_spark.drl.ast import (
    Base,
    Cartesian,
    Const,
    Diff,
    Join,
    Project,
    Query,
    Rename,
    Select,
    Take,
    Union,
)
from sakura_spark.drl.compiler import compile_query
from sakura_spark.drl.gate import GateError, admit, predicted_finite
from sakura_spark.drl.parser import ParseError, parse

__all__ = [
    "Base", "Const", "Select", "Join", "Cartesian", "Project", "Rename",
    "Union", "Diff", "Take", "Query", "parse", "ParseError",
    "compile_query", "admit", "predicted_finite", "GateError",
]
