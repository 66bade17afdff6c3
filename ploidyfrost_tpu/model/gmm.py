"""GMM-EM ploidy model (replaces src/GmmModel.{hpp,cpp}).

For each gauss count g (= candidate ploidy - 1) in [l-1, u-1]:
  init means_i = i/(g+1), weights = 1/g, vars = 0.01
  EM until delta-loglikelihood < delta or max iterations
  report avg loglikelihood and AIC; ploidy = argmin AIC + 1.

Deliberately replicated reference quirks (each cited):
  * means are NEVER updated by an EM step — new_means is copied from the
    old means and the computed update is discarded
    (src/GmmModel.cpp:301-315).
  * step rejection guard: if the max new weight is an INTERIOR component
    and min weight < 1/g/m_thre or < max_w/g/n_thre, the whole step is
    discarded (src/GmmModel.cpp:318-330).
  * zero densities and zero variances are clamped to DBL_MIN
    (src/GmmModel.cpp:270, 289, 311-313).
  * AIC = (2*(2g - 1) - 2*ll) / N  (src/GmmModel.hpp:27-31).
  * emIterate stops when (ll_new - ll_old) <= delta — the raw signed
    difference, not |delta| (src/GmmModel.cpp:385-391).
  * readFreFile's `while (!eof)` loop re-appends the last value when the
    file ends with trailing whitespace (src/GmmModel.cpp:252-257).
  * readCovFile closes the pentacov stream before reading it, so penta
    rows never contribute via the -f path (src/GmmModel.cpp:174-176),
    and its frequency guard uses INTEGER division cov/cov_sum
    (src/GmmModel.cpp:56, 102).

Compute is vectorized jnp float64 (the per-point, per-component E-step is
one [N, G] broadcast instead of the reference's nested loops); reductions
use XLA's tree sums, which agree with the reference's sequential C++
double sums to ~1e-12 relative — far inside the 6-significant-digit
output format (util/format.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..util.format import cpp_double

DBL_MIN = float(np.finfo(np.float64).tiny)  # 2.2250738585072014e-308
DBL_MAX = float(np.finfo(np.float64).max)


@jax.jit
def _log_likelihood(af, mask, means, weights, variances):
    return _ll_body(af, mask, means, weights, variances)


@jax.jit
def _em_step(af, mask, means, weights, variances, m_thre, n_thre):
    """One EM step with the reference's frozen means + rejection guard
    (src/GmmModel.cpp:275-334)."""
    return _em_body(af, mask, means, weights, variances, m_thre, n_thre)


@functools.partial(jax.jit, static_argnums=(5, 6))
def _em_iterate(af, mask, means, weights, variances, max_iter, m_n_thre):
    """Whole emIterate loop (src/GmmModel.cpp:379-394) fused into one
    device program: init ll, then while (delta > max_delta && count <
    max_iter) { em_step; recompute ll }."""
    m_thre, n_thre, max_delta = m_n_thre

    def ll_of(v, w):
        return _ll_body(af, mask, means, w, v)

    def cond(carry):
        v, w, ll, delta, count = carry
        return jnp.logical_and(delta > max_delta, count < max_iter)

    def body(carry):
        v, w, ll, _, count = carry
        v2, w2 = _em_body(af, mask, means, w, v, m_thre, n_thre)
        ll2 = ll_of(v2, w2)
        return v2, w2, ll2, ll2 - ll, count + 1

    ll0 = ll_of(variances, weights)
    v, w, ll, _, _ = jax.lax.while_loop(
        cond, body, (variances, weights, ll0, np.float64(DBL_MAX), np.int64(0))
    )
    return v, w, ll


def _ll_body(af, mask, means, weights, variances):
    d = af[:, None] - means[None, :]
    p = (
        1.0 / jnp.sqrt(2.0 * jnp.pi * variances)[None, :]
        * jnp.exp(-(d * d) / (2.0 * variances)[None, :])
    )
    s = jnp.sum(weights[None, :] * p, axis=1)
    s = jnp.where(s == 0.0, DBL_MIN, s)
    return jnp.sum(jnp.log(s) * mask)


def _em_body(af, mask, means, weights, variances, m_thre, n_thre):
    g = means.shape[0]
    d = af[:, None] - means[None, :]
    p = (
        1.0 / jnp.sqrt(2.0 * jnp.pi * variances)[None, :]
        * jnp.exp(-(d * d) / (2.0 * variances)[None, :])
    )
    part = weights[None, :] * p
    part = jnp.where(part == 0.0, DBL_MIN, part)
    rowsum = jnp.sum(part, axis=1, keepdims=True)
    resp = part / rowsum * mask[:, None]
    gauss_sum = jnp.sum(resp, axis=0)
    var_sum = jnp.sum(resp * d * d, axis=0)
    total = jnp.sum(gauss_sum)
    new_vars = var_sum / gauss_sum
    new_vars = jnp.where(new_vars == 0.0, DBL_MIN, new_vars)
    new_weights = gauss_sum / total
    max_w = jnp.max(new_weights)
    interior = jnp.logical_and(max_w != new_weights[0], max_w != new_weights[g - 1])
    min_w = jnp.min(new_weights)
    reject = jnp.logical_and(
        interior,
        jnp.logical_or(min_w < 1.0 / g / m_thre, min_w < max_w / g / n_thre),
    )
    out_vars = jnp.where(reject, variances, new_vars)
    out_weights = jnp.where(reject, weights, new_weights)
    return out_vars, out_weights


class GmmModel:
    """API mirror of the reference GmmModel (src/GmmModel.hpp:5-50)."""

    def __init__(self):
        self.allele_fre = np.zeros((0,), dtype=np.float64)
        self.gauss = 0
        self.means = np.zeros(0)
        self.weights = np.zeros(0)
        self.vars = np.zeros(0)
        self.m_thre = 5.0
        self.n_thre = 2.0
        self.em_max_iter = 1000
        self.em_max_delta = 0.01
        self.log_likelihood = 0.0
        self.aic = 0.0
        self._af_dev = None
        # optional device mesh: em_iterate runs the psum-sharded EM
        # (parallel/sharded.py) with a host emIterate loop
        self.mesh = None
        self._mesh_steps = None

    # -- configuration ---------------------------------------------------

    def set_m_threshold(self, m):
        self.m_thre = float(m)

    def set_n_threshold(self, n):
        self.n_thre = float(n)

    def set_max_iter_num(self, i):
        self.em_max_iter = int(i)

    def set_max_delta_num(self, d):
        self.em_max_delta = float(d)

    # -- data ingestion ----------------------------------------------------

    def read_data(self, data):
        self.allele_fre = np.asarray(data, dtype=np.float64)
        self._af_dev = None

    def read_fre_file(self, filename: str, frequency: float):
        """Whitespace-separated frequencies filtered to [freq, 1-freq].

        Replicates operator>> in a `while (!eof)` loop: when the file has
        trailing whitespace after the last token, the final extraction
        fails leaving the previous value in place, which appends the last
        accepted-or-not value once more (src/GmmModel.cpp:252-257).
        """
        with open(filename, "rb") as f:
            text = f.read().decode()
        vals = []
        tokens = text.split()
        # simulate the stream: last extraction fails iff trailing whitespace
        # (or empty file); `a` retains its previous value and is re-tested.
        trailing_ws = len(text) > 0 and text[-1].isspace()
        a = None
        for t in tokens:
            a = float(t)
            if a >= frequency and a <= 1 - frequency:
                vals.append(a)
        if trailing_ws and a is not None:
            if a >= frequency and a <= 1 - frequency:
                vals.append(a)
        self.read_data(np.array(vals, dtype=np.float64))

    def read_cov_file(self, prefix: str, frequency: float):
        """Read {prefix}_{bi,tri,tetra,penta}cov.txt (src/GmmModel.cpp:22-240).

        penta is opened but closed before its read loop
        (src/GmmModel.cpp:174-176), so it never contributes — replicated.
        The per-row guard divides INTEGERS: cov[0]/cov_sum and min/cov_sum
        are C++ int divisions (0 unless numerator == cov_sum).
        """
        vals: list[float] = []

        def atoi(s: str) -> int:
            s = s.strip()
            m = ""
            for ch in s.lstrip():
                if ch in "+-" and not m:
                    m += ch
                elif ch.isdigit():
                    m += ch
                else:
                    break
            try:
                return int(m)
            except ValueError:
                return 0

        def row_vals(line: str, ncov: int):
            parts = line.split("\t")
            # the reference requires `ncov` tab positions to exist, i.e.
            # at least ncov+1 tab-separated fields (src/GmmModel.cpp:44-48)
            if len(parts) < ncov + 1:
                return None
            return [atoi(parts[i]) for i in range(ncov)]

        def ref_min(cov: list[int]) -> int:
            # replicate the buggy chained-min (compares neighbours, not the
            # running minimum) of src/GmmModel.cpp:93-101, 142-154, 202-218
            mn = cov[0]
            for i in range(1, len(cov)):
                if cov[i] < cov[i - 1]:
                    mn = cov[i]
            return mn

        for ncov, suffix in ((2, "_bicov.txt"), (3, "_tricov.txt"), (4, "_tetracov.txt")):
            try:
                f = open(prefix + suffix)
            except OSError:
                raise FileNotFoundError(f"Model::readCovFile() : Open cov file error: {prefix + suffix}")
            with f:
                for line in f:
                    cov = row_vals(line.rstrip("\n"), ncov)
                    if cov is None:
                        continue
                    cov_sum = sum(cov)
                    if cov_sum < 10000 and cov_sum > 0:
                        mn = cov[0] if ncov == 2 else ref_min(cov)
                        q = mn // cov_sum if mn >= 0 else -((-mn) // cov_sum)  # C++ int division truncates
                        if q >= frequency and q <= 1 - frequency:
                            vals.extend(float(c) / cov_sum for c in cov)
        # pentacov: opened + existence-checked but closed before reading
        # (src/GmmModel.cpp:174-176) -> contributes nothing.
        if not _exists(prefix + "_pentacov.txt"):
            raise FileNotFoundError("Model::readCovFile() : Open cov file error")
        self.read_data(np.array(vals, dtype=np.float64))

    # -- model fitting -----------------------------------------------------

    def resize(self, g: int):
        g = int(g)
        self.gauss = g
        self.means = np.array([i / (g + 1) for i in range(1, g + 1)], dtype=np.float64)
        self.weights = np.full(g, 1.0 / g, dtype=np.float64)
        self.vars = np.full(g, 0.01, dtype=np.float64)

    def _af(self):
        """Device copy padded to a power-of-two bucket with a validity
        mask, so the jitted EM programs are reused across dataset sizes.
        With a mesh, the bucket is additionally padded to a multiple of
        the device count and the arrays are put sharded."""
        if self._af_dev is None:
            n = len(self.allele_fre)
            cap = max(256, 1 << (max(n - 1, 1)).bit_length())
            if self.mesh is not None:
                D = self.mesh.devices.size
                cap += (-cap) % D
            af = np.zeros(cap, dtype=np.float64)
            af[:n] = self.allele_fre
            mask = np.zeros(cap, dtype=np.float64)
            mask[:n] = 1.0
            if self.mesh is not None:
                import jax
                from jax.sharding import NamedSharding, PartitionSpec

                s = NamedSharding(self.mesh, PartitionSpec(("data", "shard")))
                if jax.process_count() > 1:
                    # multi-host: every process holds the full (small)
                    # frequency vector; supply this process's slice of
                    # the global sharded array (cap is a multiple of
                    # the device count, hence of the process count)
                    nproc = jax.process_count()
                    pid = jax.process_index()
                    loc = cap // nproc

                    def _g(x):
                        return jax.make_array_from_process_local_data(
                            s,
                            np.ascontiguousarray(
                                x[pid * loc : (pid + 1) * loc]
                            ),
                            global_shape=(cap,),
                        )

                    self._af_dev = (_g(af), _g(mask))
                else:
                    self._af_dev = (
                        jax.device_put(af, s),
                        jax.device_put(mask, s),
                    )
            else:
                self._af_dev = (jnp.asarray(af), jnp.asarray(mask))
        return self._af_dev

    def compute_log_likelihood(self) -> float:
        af, mask = self._af()
        return float(
            _log_likelihood(
                af, mask,
                jnp.asarray(self.means),
                jnp.asarray(self.weights),
                jnp.asarray(self.vars),
            )
        )

    def em_step(self):
        af, mask = self._af()
        v, w = _em_step(
            af, mask,
            jnp.asarray(self.means),
            jnp.asarray(self.weights),
            jnp.asarray(self.vars),
            self.m_thre,
            self.n_thre,
        )
        self.vars = np.asarray(v)
        self.weights = np.asarray(w)

    def em_iterate(self):
        if self.mesh is not None:
            self._em_iterate_mesh()
            return
        af, mask = self._af()
        v, w, ll = _em_iterate(
            af, mask,
            jnp.asarray(self.means),
            jnp.asarray(self.weights),
            jnp.asarray(self.vars),
            self.em_max_iter,
            (self.m_thre, self.n_thre, self.em_max_delta),
        )
        self.vars = np.asarray(v)
        self.weights = np.asarray(w)
        self.log_likelihood = float(ll)
        self.compute_aic()

    def _em_iterate_mesh(self):
        """emIterate (src/GmmModel.cpp:379-394) with the psum-sharded EM
        and ll steps: the N-point reductions split over the mesh, the
        loop control stays on host (each step already returns the
        post-update ll, so one device call per iteration)."""
        if self._mesh_steps is None:
            from ..parallel.sharded import (
                build_sharded_em_step,
                build_sharded_ll_step,
            )

            self._mesh_steps = (
                build_sharded_em_step(self.mesh),
                build_sharded_ll_step(self.mesh),
            )
        em_step, ll_step = self._mesh_steps
        af, mask = self._af()
        means = jnp.asarray(self.means)
        w = jnp.asarray(self.weights)
        v = jnp.asarray(self.vars)
        ll = float(ll_step(af, mask, means, w, v))
        delta = DBL_MAX
        count = 0
        while delta > self.em_max_delta and count < self.em_max_iter:
            v, w, ll2 = em_step(af, mask, means, w, v, self.m_thre, self.n_thre)
            ll2 = float(ll2)
            delta = ll2 - ll
            ll = ll2
            count += 1
        self.vars = np.asarray(v)
        self.weights = np.asarray(w)
        self.log_likelihood = ll
        self.compute_aic()

    def compute_aic(self) -> float:
        self.aic = (2 * (self.gauss * 2 - 1) - 2 * self.log_likelihood) / len(
            self.allele_fre
        )
        return self.aic

    def get_log_likelihood(self) -> float:
        return self.log_likelihood

    def get_aic(self) -> float:
        return self.aic

    # -- reporting -----------------------------------------------------------

    def output(self, stream):
        """Identical layout to GmmModel::output (src/GmmModel.cpp:357-378)."""
        w = stream.write
        w(f"ploidy : {self.gauss + 1}\tgauss : {self.gauss}\n")
        w(
            "avg loglikelihood : "
            + cpp_double(self.log_likelihood / len(self.allele_fre))
            + "\n"
        )
        w("AIC : " + cpp_double(self.aic) + "\n")
        w("means :\t\n\t")
        w("\t".join(cpp_double(m) for m in self.means) + "\t\n")
        w("weights :\t\n\t")
        w("\t".join(cpp_double(x) for x in self.weights) + "\t\n")
        w("variances :\t\n\t")
        w("\t".join(cpp_double(x) for x in self.vars) + "\t\n")
        w("-----------------------------------\n")


def _exists(path: str) -> bool:
    import os

    return os.path.exists(path)


def run_model(
    out_prefix: str,
    fre_file: str | None = None,
    cov_prefix: str | None = None,
    gauss_lower: int = 1,
    gauss_upper: int = 9,
    frequency: float = 0.0,
    max_iter: int = 1000,
    delta: float = 0.01,
    m_threshold: float = 5.0,
    n_threshold: float = 2.0,
) -> float:
    """The `PloidyFrost model` subcommand (src/Main.cpp:636-719).

    Returns the estimated ploidy (min-AIC). Writes
    {out_prefix}_model_result.txt with the reference's exact layout,
    including `maxll` initialized to DBL_MIN — a *positive* tiny value,
    so negative loglikelihoods never displace ploidy 0
    (src/Main.cpp:666-689).
    """
    model = GmmModel()
    from ..parallel.mesh import resolve_mesh

    model.mesh = resolve_mesh()
    model.set_m_threshold(m_threshold)
    model.set_n_threshold(n_threshold)
    model.set_max_iter_num(max_iter)
    model.set_max_delta_num(delta)
    if cov_prefix:
        model.read_cov_file(cov_prefix, frequency)
    else:
        model.read_fre_file(fre_file, frequency)
    maxll = DBL_MIN
    minaic = DBL_MAX
    ll_p = 0.0
    aic_p = 0.0
    from ..parallel.mesh import is_primary

    # multi-host: every process fits the identical model; only process
    # 0 writes the result file (shared filesystem)
    import os as _os

    result_path = (
        out_prefix + "_model_result.txt" if is_primary() else _os.devnull
    )
    with open(result_path, "w") as outfile:
        for g in range(gauss_lower, gauss_upper + 1):
            model.resize(g)
            model.em_iterate()
            model.output(outfile)
            if model.get_log_likelihood() > maxll:
                maxll = model.get_log_likelihood()
                ll_p = g + 1
            if model.get_aic() < minaic:
                minaic = model.get_aic()
                aic_p = g + 1
        outfile.write(
            "max loglikelihood : " + cpp_double(maxll) + "\tploidy : " + cpp_double(ll_p) + "\n"
        )
        outfile.write(
            "min AIC : " + cpp_double(minaic) + "\tploidy : " + cpp_double(aic_p) + "\n"
        )
        outfile.write("estimated ploidy level is : " + cpp_double(aic_p) + "\n")
    return aic_p
