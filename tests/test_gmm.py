"""GMM-EM tests: vectorized device EM vs a literal sequential re-derivation
of the reference algorithm (src/GmmModel.cpp), plus output formatting."""

import io
import math

import numpy as np
import pytest

from ploidyfrost_tpu.model.gmm import DBL_MIN, GmmModel, run_model
from ploidyfrost_tpu.util.format import cpp_double


class SeqRefGmm:
    """Literal sequential-python re-derivation of the reference EM
    (src/GmmModel.cpp:259-334) used as the test oracle."""

    def __init__(self, data, m_thre=5.0, n_thre=2.0):
        self.af = list(map(float, data))
        self.m_thre = m_thre
        self.n_thre = n_thre

    def resize(self, g):
        self.g = g
        self.means = [i / (g + 1) for i in range(1, g + 1)]
        self.weights = [1.0 / g] * g
        self.vars = [0.01] * g

    def pdf(self, mean, var, x):
        return 1 / math.sqrt(2 * math.pi * var) * math.exp(-((x - mean) ** 2) / (2 * var))

    def loglik(self):
        s = 0.0
        for af in self.af:
            row = 0.0
            for i in range(self.g):
                row += self.weights[i] * self.pdf(self.means[i], self.vars[i], af)
            if row == 0.0:
                row = DBL_MIN
            s += math.log(row)
        return s

    def em_step(self):
        g = self.g
        gauss_sum = [0.0] * g
        var_sum = [0.0] * g
        total = 0.0
        for af in self.af:
            part = []
            rowsum = 0.0
            for i in range(g):
                p = self.weights[i] * self.pdf(self.means[i], self.vars[i], af)
                if p == 0.0:
                    p = DBL_MIN
                part.append(p)
                rowsum += p
            for i in range(g):
                part[i] /= rowsum
                gauss_sum[i] += part[i]
                var_sum[i] += part[i] * (af - self.means[i]) ** 2
                total += part[i]
        new_vars = []
        new_weights = []
        for i in range(g):
            var = var_sum[i] / gauss_sum[i]
            if var == 0.0:
                var = DBL_MIN
            new_vars.append(var)
            new_weights.append(gauss_sum[i] / total)
        max_w = max(new_weights)
        if max_w != new_weights[0] and max_w != new_weights[g - 1]:
            min_w = min(new_weights)
            if min_w < 1 / g / self.m_thre or min_w < max_w / g / self.n_thre:
                return
        self.vars = new_vars
        self.weights = new_weights


@pytest.mark.parametrize("g", [1, 2, 3, 4])
def test_em_step_matches_sequential_reference(g):
    rng = np.random.default_rng(7)
    data = np.clip(rng.normal(0.5, 0.2, size=300), 0.01, 0.99)
    ref = SeqRefGmm(data)
    ref.resize(g)
    m = GmmModel()
    m.read_data(data)
    m.resize(g)
    for _ in range(5):
        ref.em_step()
        m.em_step()
        np.testing.assert_allclose(m.weights, ref.weights, rtol=1e-10)
        np.testing.assert_allclose(m.vars, ref.vars, rtol=1e-10)
    np.testing.assert_allclose(m.compute_log_likelihood(), ref.loglik(), rtol=1e-10)


def test_means_never_updated():
    rng = np.random.default_rng(3)
    m = GmmModel()
    m.read_data(np.clip(rng.normal(0.5, 0.1, 200), 0.01, 0.99))
    m.resize(3)
    means0 = m.means.copy()
    m.em_iterate()
    np.testing.assert_array_equal(m.means, means0)


def test_diploid_data_picks_ploidy_2(tmp_path):
    # diploid: allele frequencies cluster at 1/2
    rng = np.random.default_rng(0)
    fre = np.clip(rng.normal(0.5, 0.05, size=2000), 0.02, 0.98)
    p = tmp_path / "fre.txt"
    p.write_text("".join(f"{x:.7g}\n" for x in fre))
    ploidy = run_model(str(tmp_path / "out"), fre_file=str(p))
    assert ploidy == 2
    text = (tmp_path / "out_model_result.txt").read_text()
    assert "estimated ploidy level is : 2" in text


def test_tetraploid_data_picks_ploidy_4(tmp_path):
    rng = np.random.default_rng(1)
    fre = np.concatenate(
        [
            np.clip(rng.normal(c, 0.03, size=800), 0.02, 0.98)
            for c in (0.25, 0.5, 0.75)
        ]
    )
    p = tmp_path / "fre.txt"
    p.write_text("".join(f"{x:.7g}\n" for x in fre))
    assert run_model(str(tmp_path / "out"), fre_file=str(p)) == 4


def test_read_fre_file_trailing_whitespace_duplicates_last(tmp_path):
    p = tmp_path / "fre.txt"
    p.write_text("0.5\n0.25\n")  # trailing newline -> last value duplicated
    m = GmmModel()
    m.read_fre_file(str(p), 0.0)
    assert list(m.allele_fre) == [0.5, 0.25, 0.25]
    p2 = tmp_path / "fre2.txt"
    p2.write_text("0.5\n0.25")  # no trailing ws -> no duplicate
    m2 = GmmModel()
    m2.read_fre_file(str(p2), 0.0)
    assert list(m2.allele_fre) == [0.5, 0.25]


def test_read_cov_file_integer_division_and_penta_ignored(tmp_path):
    # bicov rows: covs then isStrict VarType VarId VarNum VarDis
    (tmp_path / "x_bicov.txt").write_text("30\t30\t1\t0\t1\t1\t5\t\n")
    (tmp_path / "x_tricov.txt").write_text("10\t10\t10\t1\t0\t2\t1\t5\t\n")
    (tmp_path / "x_tetracov.txt").write_text("")
    (tmp_path / "x_pentacov.txt").write_text("9\t9\t9\t9\t9\t1\t0\t3\t1\t5\t\n")
    m = GmmModel()
    m.read_cov_file(str(tmp_path / "x"), 0.0)
    # penta row ignored (stream closed before read, src/GmmModel.cpp:174-176)
    assert len(m.allele_fre) == 5
    np.testing.assert_allclose(m.allele_fre[:2], [0.5, 0.5])
    # with frequency > 0 the integer-division guard rejects everything
    # except rows where one cov equals the whole sum
    m2 = GmmModel()
    m2.read_cov_file(str(tmp_path / "x"), 0.4)
    assert len(m2.allele_fre) == 0


def test_cpp_double_formatting():
    assert cpp_double(0.5) == "0.5"
    assert cpp_double(1.0) == "1"
    assert cpp_double(39.3333333) == "39.3333"
    assert cpp_double(1234567.0) == "1.23457e+06"
    assert cpp_double(0.00001) == "1e-05"
    assert cpp_double(-2.5e-308) == "-2.5e-308"
    assert cpp_double(123456.0) == "123456"


def test_model_result_layout(tmp_path):
    rng = np.random.default_rng(5)
    fre = np.clip(rng.normal(0.5, 0.05, 500), 0.02, 0.98)
    p = tmp_path / "fre.txt"
    p.write_text("".join(f"{x:.7g}\n" for x in fre))
    run_model(str(tmp_path / "out"), fre_file=str(p), gauss_lower=1, gauss_upper=3)
    lines = (tmp_path / "out_model_result.txt").read_text().splitlines()
    assert lines[0].startswith("ploidy : 2\tgauss : 1")
    assert lines[1].startswith("avg loglikelihood : ")
    assert lines[2].startswith("AIC : ")
    assert lines[3] == "means :\t"
    assert lines[7] == "variances :\t"
    assert lines[9] == "-----------------------------------"
    assert lines[-1].startswith("estimated ploidy level is : ")
