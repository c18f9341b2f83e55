"""Differential vs the COMPILED reference engine (algorithms/sau — the
suffix-array oracle the reference itself verifies against): occurrence
counts and exact positions for a genpatterns-sampled workload must match
our k-gram substring index.  Skipped where the reference tree or a C
toolchain is unavailable."""

import importlib.util
import os
import shutil

import pytest

from tests.conftest import spark  # noqa: F401

_TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "reference_crosscheck.py",
)


def _load_tool():
    spec = importlib.util.spec_from_file_location("refxchk", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(
    not (os.path.isdir("/root/reference") and shutil.which("gcc")
         and shutil.which("g++") and shutil.which("make")),
    reason="reference tree or C toolchain unavailable",
)
def test_counts_and_positions_match_reference_binary(spark):
    mod = _load_tool()
    assert mod.run_crosscheck(spark, n_docs=80, plen=7, npat=25) == 0
