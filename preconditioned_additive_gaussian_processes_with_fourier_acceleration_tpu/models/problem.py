"""High-level GP problem wrapper: kernel + operators + preconditioner + loop.

Rebuild of SRC/optimizer/gp_problem.c (the struct bundling 20+ function
pointers, gp_problem.h:20-75) and the convenience wrappers
Nfft4GPGpLossGaussianRANSoftPlus (gp_loss.c:28-94) / the RAN+softplus predict
(gp_predict.c:5-60): one object wires kernel kind, additive windows, the
operator backend (exact dense or Fourier fastsum), the preconditioner family,
and the transform into jitted loss/predict callables.
"""

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kernels import KernelParams, make_windows
from ..ops import fastsum as fs
from ..preconds.chol import chol_setup
from ..preconds.nystrom import nystrom_setup
from ..preconds.fsai import fsai_setup
from ..preconds.afn import afn_plan, afn_setup_from_plan
from ..solvers.lanczos import rademacher_probes
from ..utils.datasets import expand_perm, rand_perm
from .gp import GPConfig, gp_loss, gp_predict
from .transforms import transform_inverse
from .adam import adam_run


def _stream_ops(plan, table_dtype, nf_stencils=None):
    """(matvec, dmatvec) on the streamed packed-table Pallas kernels.

    Both are custom_vmap-wrapped so SLQ's vmap over Rademacher probes
    (solvers/lanczos.py) dispatches to the multi-RHS kernels — all probes
    share ONE phase-table stream per pass instead of re-reading the table
    per probe (the matvec is HBM-bound, ROOFLINE.md).  Single-RHS callers
    (FGMRES/PCG) hit the primal kernels unchanged.
    """
    from jax import custom_batching

    pn = fs.packed_ndft_plan(plan, table_dtype=table_dtype,
                             nf_stencils=nf_stencils)
    interp = jax.default_backend() == "cpu"   # Mosaic is TPU-only
    # upcast=True: bf16 table blocks upcast to f32 in VMEM before the dots —
    # measured SAME speed as direct-bf16 MXU operands on v5e (the matvec is
    # HBM-bound either way) and ~1.7x more accurate (.r3_probe6.json).
    # bf16 tables bound the accuracy anyway, so single-pass (default) MXU
    # dots; f32 tables (the accuracy mode) get full bf16x6 passes.
    prec = "default" if table_dtype == jnp.bfloat16 else "highest"
    kw = dict(interpret=interp, upcast=True, prec=prec)

    # the plan is an explicit argument (NOT a closure): custom_vmap lifts
    # the function into a primitive, and closed-over tracers (the plan is
    # built inside jit) have no constant handler there.

    @custom_batching.custom_vmap
    def _mv(pn_, v):
        return fs.packed_ndft_matvec(pn_, v, **kw)

    @_mv.def_vmap
    def _matvec_rule(axis_size, in_batched, pn_, vb):
        return fs.packed_ndft_matvec_batch(pn_, vb, **kw), True

    @custom_batching.custom_vmap
    def _dmv(pn_, v):
        return fs.packed_ndft_grad_matvec(pn_, v, **kw)

    @_dmv.def_vmap
    def _dmatvec_rule(axis_size, in_batched, pn_, vb):
        return fs.packed_ndft_grad_matvec_batch(pn_, vb, **kw), True

    return (lambda v: _mv(pn, v)), (lambda v: _dmv(pn, v))


@dataclass
class GPProblem:
    """User-facing GP regression problem (ref gp_problem.h:20-75).

    kernel:   'gaussian' | 'matern32' | 'matern12'
    windows:  None (full kernel) or list of feature-index lists (additive)
    operator: 'dense' | 'fastsum'
    precond:  'none' | 'chol' | 'nystrom' | 'fsai' | 'afn'
    """

    kernel: str = "gaussian"
    windows: Optional[list] = None
    operator: str = "dense"
    precond: str = "nystrom"
    transform: str = "softplus"
    rank: int = 50               # nystrom/afn rank
    lfil: int = 20               # fsai fill
    maxits: int = 10             # SLQ steps; FGMRES uses 2x
    nvecs: int = 10              # SLQ probes
    tol: float = 1e-6
    fastsum_N: int = 32
    fastsum_table_dtype: Optional[str] = "auto"  # phase-table dtype for the
    # TRAINING operator.  'auto' = bfloat16 when the data is float32 (the
    # measured-default TPU speed mode: 1.8x matvec rate at ~3e-3 operator
    # accuracy — see ROOFLINE.md; SLQ probe noise dominates the loss
    # estimator anyway), None when the data is f64 (CPU parity runs).
    # Set None/'float32' to force full-precision tables; predict always
    # builds f32 plans.  CAUTION: bf16 operators are for the SHORT-
    # recurrence training loop (FGMRES kdim = 2*maxits ~ 20).  Deep Krylov
    # solves (kdim ~ 50+) on a bf16 operator break the Arnoldi relation at
    # noise*||y|| and the true residual DIVERGES (measured relres 49 at
    # n=3e5 kdim=50 vs 0.13 with f32 tables, same code) — use f32 tables
    # for solve benchmarks.
    fastsum_oversample: int = 2        # coefficient-grid oversampling (NN=2N)
    fastsum_nearfield_lfil: Optional[int] = None  # sparse near-field correction
    # (the eps_I role).  None = auto: 16 for matern12 (whose kink makes the
    # pure Fourier operator ~4e-2 inaccurate at N=32 — the reference's
    # fastsum regularization is always-on, nfft_interface.c:18-27), else 0.
    fastsum_fused: bool = False        # packed Pallas fused-phase matvecs
    # (TPU only; phases regenerated in VMEM instead of HBM tables)
    predict_operator: str = "auto"     # 'auto' | 'dense' | 'fastsum'.
    # 'auto' SAFETY RULE: matern12 + fastsum predictions are computed with
    # the exact dense kernel when the train set fits (n <= 20k) — the
    # Fourier kink error amplifies through the fitted system and inflated
    # TEST4 matern12 RMSE 0.26 -> 0.97 in r4 (TEST4.md); larger sets keep
    # fastsum and print a warning.  Ref: TESTS/TEST4/foo.cpp:401-410.
    fastsum_engine: str = "auto"       # 'table' (XLA folded-NDFT GEMMs) |
    # 'stream' (streamed packed-table Pallas kernels, additive windows only:
    # no dot-operand HBM materializations, and SLQ probe batches share ONE
    # table stream per pass via the multi-RHS kernels — see
    # ops/fastsum.packed_ndft_matvec_batch; measured r3: 470 us vs the
    # table path's 517 us bf16 / 961 us f32 at n=2e5,d=10) | 'auto'
    # (stream on TPU backends, table on CPU).  'stream' falls back to
    # 'table' for non-additive problems.  On CPU backends the kernels run
    # in interpret mode (tests); on TPU they compile with Mosaic.
    seed: int = 0
    mask: tuple = (1, 1, 1)      # which of (f, l, mu) receive gradients

    # filled by fit()
    raw_params_: Optional[jnp.ndarray] = None
    loss_history_: list = field(default_factory=list)

    def _windows_arr(self):
        return make_windows(self.windows) if self.windows is not None else None

    def _nf_lfil(self):
        if self.fastsum_nearfield_lfil is None:
            return 16 if self.kernel == "matern12" else 0
        return self.fastsum_nearfield_lfil

    def _cfg(self):
        return GPConfig(
            kind=self.kernel, transform=self.transform, maxits=self.maxits,
            nvecs=self.nvecs, tol=self.tol, mask=tuple(self.mask),
        )

    def _build_ops_factory(self, X):
        warr = self._windows_arr()
        if self.operator == "dense":
            from .gp import make_dense_ops

            return make_dense_ops(self.kernel, X, windows=warr)
        if self.operator != "fastsum":
            raise ValueError(f"unknown operator {self.operator}")
        if self.fastsum_table_dtype == "auto":
            tdt = jnp.bfloat16 if X.dtype == jnp.float32 else None
        elif self.fastsum_table_dtype in (None, "float32"):
            tdt = None
        else:
            tdt = jnp.dtype(self.fastsum_table_dtype)
        if warr is not None:
            geom = jax.jit(
                lambda Xv: fs.additive_fastsum_geometry(
                    Xv, warr, N=self.fastsum_N, table_dtype=tdt
                )
            )(X)
            # the KNN patterns are params-independent: compute once per
            # dataset, not per loss eval (the correction VALUES still
            # refresh with params inside build)
            if self.fastsum_fused and self.fastsum_engine == "stream":
                raise ValueError(
                    "fastsum_fused=True conflicts with fastsum_engine='stream' "
                    "— pick one (fused regenerates phases in VMEM, stream "
                    "reads packed tables)"
                )
            use_stream = self.fastsum_engine == "stream" or (
                self.fastsum_engine == "auto"
                and not self.fastsum_fused
                and jax.default_backend() not in ("cpu",)
            )

            nf_pats = None
            nf_stens = None
            nf_lfil_build = self._nf_lfil()
            if self._nf_lfil() > 0:
                if use_stream:
                    # DIRECT cell-stencil radius near-field (once per
                    # dataset): radius support (the reference's eps_I
                    # semantics), values computed straight in stencil
                    # layout, gather-free apply (ops/cellgrid.py: 0.71 vs
                    # 11.3 ms at (1e5, 16) on v5e)
                    nf_stens = fs.additive_nearfield_stencil_direct(
                        geom, self.kernel, self._nf_lfil()
                    )
                if nf_stens is not None:
                    # ELL patterns remain only for d=3 groups (table path)
                    nf_lfil_build = 0
                    has_d3 = any(bg.x.shape[2] == 3 for _, _, bg in geom.groups)
                    if has_d3:
                        pats = jax.jit(
                            lambda g: fs.additive_nearfield_patterns(
                                self.kernel, g, self._nf_lfil()
                            )
                        )(geom)
                        pats = tuple(
                            p if bg.x.shape[2] == 3 else None
                            for p, (_, _, bg) in zip(pats, geom.groups)
                        )
                        nf_pats = fs.symmetrize_nearfield_patterns(pats)
                else:
                    # degenerate grids (clustered/duplicate features): KNN
                    # pattern + host symmetrization — one gather-matvec
                    # instead of the scatter-add transpose (r4 profiling)
                    nf_pats = jax.jit(
                        lambda g: fs.additive_nearfield_patterns(
                            self.kernel, g, self._nf_lfil()
                        )
                    )(geom)
                    nf_pats = fs.symmetrize_nearfield_patterns(nf_pats)

            def build(params):
                plan = fs.additive_fastsum_coeffs(
                    self.kernel, params, geom,
                    oversample=self.fastsum_oversample,
                    nearfield_lfil=nf_lfil_build,
                    nf_patterns=nf_pats,
                )
                if use_stream:
                    return _stream_ops(plan, tdt, nf_stencils=nf_stens)
                if self.fastsum_fused:
                    return (
                        lambda v: fs.additive_fastsum_matvec_fused(plan, v),
                        lambda v: fs.additive_fastsum_grad_matvec_fused(plan, v),
                    )
                return (
                    lambda v: fs.additive_fastsum_matvec(plan, v),
                    lambda v: fs.additive_fastsum_grad_matvec(plan, v),
                )

            return build
        geom = jax.jit(
            lambda Xv: fs.fastsum_geometry(Xv, self.fastsum_N, table_dtype=tdt)
        )(X)
        nf_pat = None
        if self._nf_lfil() > 0:
            pat = jax.jit(
                lambda g: fs.nearfield_patterns(self.kernel, g, self._nf_lfil())
            )(geom)
            # symmetrize WITH the skewed in-degree guard (same rule as
            # symmetrize_nearfield_patterns: a point that is the nearest
            # preceding neighbor of many later points blows the pad width)
            import jax.numpy as _jnp
            sidx, smask = fs.symmetrize_pattern(pat[0], pat[1])
            if sidx.shape[1] > max(4 * self._nf_lfil(), 64):
                nf_pat = (pat[0], pat[1], False)
            else:
                nf_pat = (_jnp.asarray(sidx), _jnp.asarray(smask), True)

        def build(params):
            plan = fs.fastsum_coeffs(
                self.kernel, params, geom,
                oversample=self.fastsum_oversample,
                nearfield_lfil=self._nf_lfil(),
                nf_pattern=nf_pat,
            )
            return (
                lambda v: fs.fastsum_matvec(plan, v),
                lambda v: fs.fastsum_grad_matvec(plan, v),
            )

        return build

    def _precond_factory(self, X, params0: KernelParams):
        n = X.shape[0]
        warr = self._windows_arr()
        key = jax.random.PRNGKey(self.seed)
        if self.precond == "none":
            return None
        if self.precond == "chol":
            from ..ops.kernels import (
                kernel_matrix_with_grad,
                additive_kernel_matrix_with_grad,
            )

            def setup(params):
                if warr is None:
                    K, dK = kernel_matrix_with_grad(self.kernel, params, X)
                else:
                    K, dK = additive_kernel_matrix_with_grad(self.kernel, params, X, warr)
                return chol_setup(K, dK=dK, require_grad=True)

            return setup
        if self.precond == "nystrom":
            k = min(self.rank, n)
            # nystrom_setup only reads the k landmark indices; the full
            # expand_perm scatter is a compile hazard on the tunneled TPU
            # backend (see ops/kernels._window_slice)
            perm = rand_perm(key, n, k)
            return lambda params: nystrom_setup(
                self.kernel, params, X, perm, k, require_grad=True, windows=warr
            )
        if self.precond == "fsai":
            from ..ops.knn import knn_pattern

            pattern = knn_pattern(X, self.lfil)
            return lambda params: fsai_setup(
                self.kernel, params, X, self.lfil, require_grad=True,
                windows=warr, pattern=pattern,
            )
        if self.precond == "afn":
            plan = afn_plan(
                self.kernel, params0, X, maxrank=self.rank, lfil=self.lfil, key=key
            )
            return lambda params: afn_setup_from_plan(
                self.kernel, params, X, plan, require_grad=True, windows=warr
            )
        raise ValueError(f"unknown precond {self.precond}")

    def make_loss(self, X, y, params0=(1.0, 1.0, 0.1)):
        """Jitted raw_params -> (loss, grad) closure."""
        n = X.shape[0]
        p0 = KernelParams.make(*params0, dtype=X.dtype)
        build = self._build_ops_factory(X)
        psetup = self._precond_factory(X, p0)
        probes = rademacher_probes(
            jax.random.PRNGKey(self.seed + 1), self.nvecs, n, dtype=X.dtype
        )
        cfg = self._cfg()

        @jax.jit
        def loss_fn(raw):
            r = gp_loss(raw, y, build, probes, cfg, psetup)
            return r.loss, r.grad

        return loss_fn

    def fit(
        self, X, y, *, init=(1.0, 1.0, 0.1), adam_maxits=100, adam_alpha=0.01,
        adam_tol=1e-6, verbose=False, replan_every=0,
    ):
        """Train hyperparameters with Adam (ref TEST4/foo.cpp:318-347).

        replan_every > 0 (AFN only): re-run the structural AFN plan (rank
        estimation + FPS + KNN pattern) every `replan_every` Adam steps at
        the CURRENT hyperparameters — the reference re-evaluates setup per
        loss eval with current params (gp_loss.c:163-172); under jit the
        structural decision must be static, so it refreshes between
        segments while Adam moments carry over.
        """
        X = jnp.asarray(X)
        y = jnp.asarray(y)
        x0 = transform_inverse(self.transform, jnp.asarray(init, X.dtype))

        def cb(it, state, loss, grad):
            if verbose:
                from .transforms import transform_forward

                tv, _ = transform_forward(self.transform, state.x)
                print(
                    f"{it + 1:6d} | {float(loss):15.8e} | "
                    f"{float(jnp.linalg.norm(grad)):15.8e} | params: "
                    f"{float(tv[0]):.6g} {float(tv[1]):.6g} {float(tv[2]):.6g}"
                )

        if replan_every and self.precond == "afn":
            from .transforms import transform_forward

            state, losses = None, []
            cur_init = init
            remaining = adam_maxits
            x = x0
            while remaining > 0:
                seg = min(replan_every, remaining)
                loss_fn = self.make_loss(X, y, params0=cur_init)
                state, seg_losses, xs, grads = adam_run(
                    loss_fn, x, maxits=seg, tol=adam_tol, alpha=adam_alpha,
                    callback=cb, state0=state,
                )
                losses.extend(seg_losses)
                x = state.x
                tv, _ = transform_forward(self.transform, state.x)
                cur_init = tuple(float(v) for v in tv)
                remaining -= seg
                if grads and float(jnp.linalg.norm(grads[-1])) < adam_tol:
                    break
        else:
            loss_fn = self.make_loss(X, y, params0=init)
            state, losses, xs, grads = adam_run(
                loss_fn, x0, maxits=adam_maxits, tol=adam_tol, alpha=adam_alpha,
                callback=cb,
            )
        self.raw_params_ = state.x
        self.loss_history_ = [float(v) for v in losses]
        return self

    def predict(self, X, y, X_test, *, with_std=False, maxits=None):
        """Posterior mean (and std) at X_test using the fitted params."""
        if self.raw_params_ is None:
            raise RuntimeError("call fit() first (or set raw_params_)")
        X = jnp.asarray(X)
        y = jnp.asarray(y)
        X_test = jnp.asarray(X_test)
        cfg = self._cfg()
        p0 = KernelParams.make(1.0, 1.0, 0.1, dtype=X.dtype)
        psetup = self._precond_factory(X, p0)
        # ONE jit around the whole prediction: on the remote-compile backend
        # an eager prediction pays a compile round-trip per op (measured
        # 400+ s for a 5.9k-point joint-plan predict; jitted: seconds).
        # The windows array is built OUTSIDE the trace (a tracing-time
        # jnp constant fails np.asarray in the geometry grouping).
        warr = self._windows_arr()
        warr = np.asarray(warr) if warr is not None else None
        pred_op = self.predict_operator
        if pred_op == "auto":
            pred_op = self.operator
            if self.operator == "fastsum" and self.kernel == "matern12":
                if X.shape[0] <= 20_000:
                    pred_op = "dense"
                else:
                    print(
                        "[predict] WARNING: matern12 fastsum predictions "
                        "carry the Fourier kink error (r4 TEST4: 4x RMSE "
                        "inflation); set predict_operator='dense' if the "
                        "train set fits, or raise fastsum_N", flush=True,
                    )
        if pred_op == "fastsum":
            from .gp import gp_predict_fastsum

            run = jax.jit(
                lambda rp, Xv, yv, Xt: gp_predict_fastsum(
                    rp, Xv, yv, Xt, cfg,
                    windows=warr, fastsum_N=self.fastsum_N,
                    precond_setup=psetup, with_std=with_std,
                    maxits=maxits or 2 * self.maxits * 10,
                    oversample=self.fastsum_oversample,
                    nearfield_lfil=self._nf_lfil(),
                )
            )
        else:
            run = jax.jit(
                lambda rp, Xv, yv, Xt: gp_predict(
                    rp, Xv, yv, Xt, cfg,
                    windows=warr, precond_setup=psetup,
                    with_std=with_std, maxits=maxits or 2 * self.maxits * 10,
                )
            )
        res = run(self.raw_params_, X, y, X_test)
        return (res.mean, res.std) if with_std else res.mean

    # --- checkpoint / resume (new capability; the reference only keeps
    # in-memory Adam histories, adam.h:37-42) ------------------------------

    def save(self, path):
        """Persist fitted hyperparameters + config + loss history (.npz)."""
        import numpy as np

        cfg = {
            k: getattr(self, k)
            for k in (
                "kernel", "operator", "precond", "transform", "rank", "lfil",
                "maxits", "nvecs", "tol", "fastsum_N", "fastsum_table_dtype",
                "fastsum_oversample", "fastsum_nearfield_lfil", "fastsum_fused",
                "fastsum_engine", "predict_operator", "seed",
            )
        }
        np.savez(
            path,
            raw_params=np.asarray(self.raw_params_) if self.raw_params_ is not None else np.zeros(0),
            loss_history=np.asarray(self.loss_history_),
            windows=np.asarray(
                [len(w) for w in self.windows] + sum(self.windows, [])
                if self.windows else []
            ),
            n_windows=len(self.windows) if self.windows else 0,
            config=np.asarray([str(cfg)]),
        )

    @staticmethod
    def load(path):
        """Restore a fitted problem (config via eval of the saved dict repr)."""
        import ast
        import numpy as np

        data = np.load(path, allow_pickle=False)
        cfg = ast.literal_eval(str(data["config"][0]))
        nw = int(data["n_windows"])
        windows = None
        if nw:
            flat = data["windows"].tolist()
            lens, rest = flat[:nw], flat[nw:]
            windows, pos = [], 0
            for L in lens:
                windows.append([int(v) for v in rest[pos : pos + L]])
                pos += L
        prob = GPProblem(windows=windows, **cfg)
        if data["raw_params"].size:
            prob.raw_params_ = jnp.asarray(data["raw_params"])
        prob.loss_history_ = data["loss_history"].tolist()
        return prob
