"""CLI smoke test: the flow analysis end-to-end through the argparse entry
point, reading parquet input and writing a scored TSV."""

from __future__ import annotations

import glob

from oni_ml_spark.cli import build_parser, main
from tests.test_pipelines import _flow_fixture


def test_parser_defaults():
    args = build_parser().parse_args(
        ["--analysis", "flow", "--input", "/x", "--output", "/y"]
    )
    assert args.dupfactor == 1000      # ml_ops.sh:49
    assert args.ldatopiccount == 20    # ml_ops.sh:67
    assert args.maxresults == -1


def test_flow_cli_end_to_end(spark, tmp_path):
    inp = str(tmp_path / "flow.parquet")
    out = str(tmp_path / "out")
    _flow_fixture(spark, n_common=300, n_rare=2).write.parquet(inp)

    rc = main(
        [
            "--analysis", "flow", "--input", inp, "--output", out,
            "--ldatopiccount", "3", "--lda-maxiter", "3",
            "--maxresults", "20", "--single-file", "--approx-quantiles",
        ]
    )
    assert rc == 0
    parts = glob.glob(f"{out}/part-*.csv")
    assert len(parts) == 1
    lines = open(parts[0]).read().strip().splitlines()
    assert 0 < len(lines) <= 20
    assert all("\t" in ln for ln in lines)
