"""Tests for the Filter.R / Filter-multi.R / Drawfreq.R ports."""

import os

import numpy as np
import pytest

from ploidyfrost_tpu.filter import FilterOptions, drawfreq, filter_tables


def write_tables(d, multi=False):
    """Synthetic cov tables in the reference's emission format."""
    color = "0\t" if multi else ""
    cramer = "0.75\t" if multi else ""
    # columns: covs... [color] isStrict VarType VarId VarNum [Cramer] VarDis
    rows_bi = [
        f"20\t22\t{color}1\t0\t1\t1\t{cramer}30\t",  # keep
        f"5\t22\t{color}1\t0\t2\t1\t{cramer}30\t",  # cov too low
        f"20\t22\t{color}0\t0\t3\t1\t{cramer}30\t",  # dropped by --simple
        f"20\t22\t{color}1\t2\t4\t1\t{cramer}30\t",  # indel (VarType 2)
    ]
    rows_tetra = [
        f"20\t20\t20\t20\t{color}1\t0\t5\t1\t{cramer}30\t",  # sum 80 >= up? depends
    ]
    with open(os.path.join(d, "in_bicov.txt"), "w") as f:
        f.write("\n".join(rows_bi) + "\n")
    with open(os.path.join(d, "in_tricov.txt"), "w") as f:
        f.write("")
    with open(os.path.join(d, "in_tetracov.txt"), "w") as f:
        f.write("\n".join(rows_tetra) + "\n")
    with open(os.path.join(d, "in_pentacov.txt"), "w") as f:
        f.write("")


def test_filter_single(tmp_path):
    d = str(tmp_path)
    write_tables(d)
    os.chdir(d)
    opt = FilterOptions(
        inprefix="in", outprefix="out", simple=True, indel=True, low=10, up=60
    )
    assert filter_tables(opt, multi=False) == 0
    bi = open("out_bicov.txt").read().splitlines()
    # only the first row survives (--simple drops isStrict=0, --indel
    # drops VarType>0, low=10 drops the 5-coverage row)
    assert bi == ["20\t22\t1\t0\t1\t1\t30"]
    # tetra row: covs in (10,60) but sum 80 >= 60 -> the sum-of-four gate
    assert open("out_tetracov.txt").read() == ""
    fre = [float(x) for x in open("out_allele_frequency.txt").read().split()]
    assert fre == [
        float(np.round(20 / 42, 7)),
        float(np.round(22 / 42, 7)),
    ]


def test_filter_single_keeps_tetra_when_sum_ok(tmp_path):
    d = str(tmp_path)
    write_tables(d)
    os.chdir(d)
    opt = FilterOptions(inprefix="in", outprefix="out2", low=10, up=100)
    assert filter_tables(opt, multi=False) == 0
    assert len(open("out2_tetracov.txt").read().splitlines()) == 1
    fre = [float(x) for x in open("out2_allele_frequency.txt").read().split()]
    # low=10 drops the (5,22) row; rows 1,3,4 survive. column-major:
    # bi alleleA x3, bi alleleB x3, then tetra columns (0.25 x4)
    assert fre[:3] == [float(np.round(20 / 42, 7))] * 3
    assert fre[3:6] == [float(np.round(22 / 42, 7))] * 3
    assert fre[6:] == [0.25] * 4


def test_filter_multi(tmp_path):
    d = str(tmp_path)
    write_tables(d, multi=True)
    os.chdir(d)
    opt = FilterOptions(inprefix="in", outprefix="outm", low=1, up=100, cramer=0.5)
    assert filter_tables(opt, multi=True) == 0
    assert len(open("outm_bicov.txt").read().splitlines()) == 4
    # cramer above threshold keeps rows; raising it drops all
    opt2 = FilterOptions(inprefix="in", outprefix="outm2", low=1, up=100, cramer=0.9)
    assert filter_tables(opt2, multi=True) == 0
    assert open("outm2_bicov.txt").read() == ""
    # color selector: color 1 matches nothing (all rows color 0)
    opt3 = FilterOptions(
        inprefix="in", outprefix="outm3", low=1, up=100, color=1
    )
    assert filter_tables(opt3, multi=True) == 0
    assert open("outm3_bicov.txt").read() == ""


def test_filter_frequency_bounds(tmp_path):
    d = str(tmp_path)
    os.chdir(d)
    with open("in_bicov.txt", "w") as f:
        f.write("99\t1\t1\t0\t1\t1\t30\t\n")  # freq 0.99/0.01
    for name in ("tri", "tetra", "penta"):
        open(f"in_{name}cov.txt", "w").close()
    opt = FilterOptions(inprefix="in", outprefix="outq", low=0, up=1000, frequency=0.05)
    assert filter_tables(opt, multi=False) == 0
    assert open("outq_allele_frequency.txt").read() == ""


def test_drawfreq(tmp_path):
    d = str(tmp_path)
    os.chdir(d)
    rng = np.random.default_rng(0)
    data = np.concatenate([rng.normal(0.33, 0.03, 300), rng.normal(0.67, 0.03, 300)])
    np.savetxt("fre.txt", np.clip(data, 0.01, 0.99))
    assert drawfreq("fre.txt", "plot", "test", 3) == 0
    assert os.path.exists("plot_allele_frequency.png")
    assert drawfreq("missing.txt", "plot") == 1
