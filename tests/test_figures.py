"""Tests for the `figures` subcommand (figures.py) — the engine-native
generalization of script/paper_figures.R, exercised on the golden
fixtures and cross-checked against hand computations."""

import os

import numpy as np
import pytest

from ploidyfrost_tpu.figures import (
    filter_tiers,
    make_figures,
    read_cov_tables,
    site_stats,
)

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def test_read_cov_tables_single():
    cov, fre = read_cov_tables(
        os.path.join(GOLD, "single_diploid", "gold"), multi=False
    )
    # coverage rows = sum of per-class row counts; frequency rows =
    # sum over classes of (rows * alleles) (paper_figures.R:43-59,66-101)
    n_rows = 0
    n_alleles = 0
    for name, k in (("bi", 2), ("tri", 3), ("tetra", 4), ("penta", 5)):
        path = os.path.join(GOLD, "single_diploid", f"gold_{name}cov.txt")
        if os.path.exists(path):
            with open(path) as f:
                m = sum(1 for line in f if line.strip())
            n_rows += m
            n_alleles += m * k
    assert len(cov["coverage"]) == n_rows
    assert len(fre["fre"]) == n_alleles
    # first bicov row: 12 + 11.44 (gold_bicov.txt line 1)
    with open(
        os.path.join(GOLD, "single_diploid", "gold_bicov.txt")
    ) as f:
        a, b = map(float, f.readline().split("\t")[:2])
    assert cov["coverage"][0] == pytest.approx(a + b)
    assert fre["fre"][0] == pytest.approx(a / (a + b))
    # frequencies sum to 1 within each site: total mass == n_rows
    assert fre["fre"].sum() == pytest.approx(n_rows)


def test_site_stats_hand_check():
    cov, _ = read_cov_tables(
        os.path.join(GOLD, "single_diploid", "gold"), multi=False
    )
    tiers = filter_tiers(cov, multi=False, cramer=0.25)
    c, p = 13.0, 2
    header, rows = site_stats(cov, tiers, [c], p, False, None)
    row = rows[0]
    arr, num, size = cov["coverage"], cov["varnum"], cov["varsize"]
    out = (arr < (p - 1) * c) | (arr > (p + 1) * c)
    assert row[1] == len(arr)
    assert row[2] == int(out.sum())
    # the VarNum<=5&VarSize<=10 tier columns (paper_figures.R:247-252)
    m5 = (num <= 5) & (size <= 10)
    assert row[3] == int(m5.sum())
    assert row[4] == pytest.approx(m5.sum() / len(arr))
    assert row[5] == int(out.sum()) - int((out & m5).sum())


def test_make_figures_single(tmp_path):
    out = str(tmp_path / "fig")
    rc = make_figures(
        os.path.join(GOLD, "single_diploid", "gold"),
        out,
        [13.0],
        2,
        gauss_lower=1,
        gauss_upper=2,
    )
    assert rc == 0
    for suffix in (
        "_site_stats.tsv",
        "_frequency_density.png",
        "_coverage_density.png",
        "_loglikelihood.tsv",
        "_loglikelihood.png",
    ):
        assert os.path.exists(out + suffix), suffix
    with open(out + "_loglikelihood.tsv") as f:
        lines = f.read().splitlines()
    # header + one row per tier (all / num5 / num1)
    assert len(lines) == 4
    assert lines[0].split("\t") == ["filter", "2", "3"]
    for line in lines[1:]:
        vals = [float(v) for v in line.split("\t")[1:]]
        assert all(np.isfinite(vals))


def test_make_figures_multi(tmp_path):
    out = str(tmp_path / "figm")
    rc = make_figures(
        os.path.join(GOLD, "multi_colored", "gold"),
        out,
        [13.0, 13.0, 13.0],
        2,
        multi=True,
        cramer=0.25,
        names=["s0", "s1", "s2"],
        with_model=False,
    )
    assert rc == 0
    with open(out + "_site_stats.tsv") as f:
        lines = f.read().splitlines()
    # one row per color (paper_figures.R:717-744)
    cov, _ = read_cov_tables(
        os.path.join(GOLD, "multi_colored", "gold"), multi=True
    )
    n_colors = len(set(cov["color"].astype(int)))
    assert len(lines) == 1 + n_colors
    assert lines[1].startswith("s0\t")
    # multi tiers include the Cramer split
    assert "Cramer's V >= 0.25" in lines[0]


def test_cli_dispatch(tmp_path):
    from ploidyfrost_tpu.cli import main

    out = str(tmp_path / "cli")
    rc = main(
        [
            "figures",
            "-i",
            os.path.join(GOLD, "single_diploid", "gold"),
            "-o",
            out,
            "-c",
            "13",
            "-p",
            "2",
            "--no-model",
        ]
    )
    assert rc == 0
    assert os.path.exists(out + "_site_stats.tsv")


def test_missing_prefix_errors():
    with pytest.raises(SystemExit):
        read_cov_tables("/nonexistent/nope", multi=False)
