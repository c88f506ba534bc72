"""TEST2 golden parity: train+predict on the reference's "Figure 3" problem.

Reproduces the reference's TEST2 configuration
(TESTS/TEST2/run.sh: ./foo1.ex foo ./data/foo -1 -1 0 0 0 0 500 10 10 10 1)
— n=800 train / 200 test, d=1, Gaussian kernel, raw params x0=(0,0,0)
(softplus -> 0.6931), Adam 500 iters lr=0.01, FGMRES/SLQ maxits 10, 10
probes, Nystrom rank 10 — and checks three things:

1. LOSS ORACLE (exact): our SLQ-estimated loss at the initial point must
   match the analytically exact dense NLL
   0.5*(y'K^{-1}y/n + logdet(K)/n + log 2pi) computed with LAPACK on the
   committed data (ours matches to ~1e-12).

   RESOLVED (round 3): the committed golden trace foo_0_loss_exact.txt
   starts at 1.3774 while the exact NLL at run.sh's documented start
   (raw x0 = (0,0,0) -> softplus 0.6931) is 0.5398.  The goldens were in
   fact generated with CLI params f=l=mu=1 (raw x0 = (1,1,1) -> softplus
   1.3133): the exact NLL there is 1.3773567..., equal to the golden's
   first entry to all printed digits, and our Adam run from that start
   REPRODUCES THE ENTIRE GOLDEN TRACE (|diff| <= 7e-5 over the first 60
   iterations, SLQ probe-noise level).  The committed run.sh simply does
   not match the committed goldens.  Check 1b below locks this in: with
   --golden-start the script trains from raw (1,1,1) and asserts
   trace-parity against the golden file.

2. PREDICTION QUALITY: after 500 Adam iters, our test-RMSE/std must be at
   least as good as the golden predictions' (0.1986 for exact).

3. PREDICTION AGREEMENT (informational): RMSE between our predictions and
   the goldens, after undoing the driver's srand(906) test permutation by
   matching the (distinct) label column.

4. NFFT GOLDEN TRACE (--operator fastsum, default start): the committed
   foo_0_loss_nfft.txt holds 10 iterations from the DOCUMENTED (0,0,0)
   start (+ one trailing 0.0 artifact); its first entry 0.53625 sits
   3.6e-3 below the exact NLL 0.53985 — the reference's own NFFT operator
   error.  MEASURED PARITY (r4, x64 CPU): max|trace diff| = 3.78e-3 over
   the 10 golden iterations (bound asserted: 1e-2), i.e. our folded-NDFT
   training run follows the reference's NFFT run to the sum of the two
   operators' approximation errors.  Our 500-iter test RMSE/std 0.1987
   also beats the committed NFFT golden predictions' 0.6809 outright.

Usage: python scripts/test2_parity.py [--operator dense|fastsum] [--quick]
"""

import argparse
import os
import sys

import numpy as np

REF = "/root/reference/TESTS/TEST2"

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def load_goldens(which):
    rows = []
    with open(os.path.join(REF, f"foo_0_{which}.txt")) as f:
        next(f)  # header
        for line in f:
            parts = [float(t) for t in line.split()]
            if len(parts) >= 2:
                rows.append(parts)
    rows = np.asarray(rows)
    if rows.shape[1] == 2:          # exact: Label | Predict
        labels, preds = rows[:, 0], rows[:, 1]
    else:                           # nfft: X | Label | Predict | Std
        labels, preds = rows[:, 1], rows[:, 2]
    losses = np.loadtxt(os.path.join(REF, f"foo_0_loss_{which}.txt"))
    return labels, preds, losses


def exact_nll(X, y, f, l, mu):
    n = len(y)
    r2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    K = f**2 * (np.exp(-r2 / (2 * l**2)) + mu * np.eye(n))
    _, ld = np.linalg.slogdet(K)
    a = np.linalg.solve(K, y)
    return 0.5 * (y @ a / n + ld / n + np.log(2 * np.pi))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--operator", default="dense", choices=["dense", "fastsum"])
    ap.add_argument("--quick", action="store_true",
                    help="50 Adam iters (loss-oracle check only)")
    ap.add_argument("--golden-start", action="store_true",
                    help="start from raw (1,1,1) — the start the committed "
                    "goldens were actually generated with — and assert "
                    "loss-TRACE parity against foo_0_loss_exact.txt")
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"  # x64 parity path; shell may say axon
    os.environ["JAX_ENABLE_X64"] = "1"
    import jax

    jax.config.update("jax_platforms", "cpu")  # env alone loses to the plugin
    jax.config.update("jax_enable_x64", True)

    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.io.readers import (
        read_features,
        read_labels,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.models.problem import (
        GPProblem,
    )

    X = np.asarray(read_features(os.path.join(REF, "data/foo.train.feature")))
    y = np.asarray(read_labels(os.path.join(REF, "data/foo.train.label")))
    Xt = read_features(os.path.join(REF, "data/foo.test.feature"))
    yt = np.asarray(read_labels(os.path.join(REF, "data/foo.test.label")))

    which = "exact" if args.operator == "dense" else "nfft"
    g_labels, g_preds, g_losses = load_goldens(which)
    # Undo the driver's srand(906) test permutation (foo1.cpp:122,171) by
    # matching the distinct label values (printed at 1e-10 resolution).
    perm = np.asarray([int(np.argmin(np.abs(yt - gl))) for gl in g_labels])
    np.testing.assert_allclose(yt[perm], g_labels, atol=1e-9)
    assert len(set(perm.tolist())) == len(perm), "label matching not unique"

    maxits = 50 if args.quick else 500
    ln2 = float(np.log(2.0))  # softplus(0): run.sh's documented raw 0
    sp1 = float(np.log1p(np.exp(1.0)))  # softplus(1): the goldens' true start
    init = (sp1,) * 3 if args.golden_start else (ln2,) * 3
    prob = GPProblem(
        kernel="gaussian",
        operator=args.operator,
        windows=[[0]] if args.operator == "fastsum" else None,
        precond="nystrom", rank=10, maxits=10, nvecs=10, seed=0,
    )
    prob.fit(X, y, init=init, adam_maxits=maxits, adam_alpha=0.01,
             adam_tol=0.0)
    pred = np.asarray(prob.predict(X, y, np.asarray(Xt)))[perm]
    losses = np.asarray(prob.loss_history_)

    # 1. loss oracle
    L0 = exact_nll(X, y, *init)
    d_loss0 = abs(losses[0] - L0)
    print(f"operator={args.operator} adam_maxits={maxits} "
          f"golden_start={args.golden_start}")
    print(f"loss[0] ours {losses[0]:.6f}  exact-NLL {L0:.6f}  |d|={d_loss0:.2e}")

    # 1b. golden loss-TRACE parity.
    # dense (--golden-start): vs foo_0_loss_exact.txt from raw (1,1,1) — the
    #   start those goldens were actually generated with (see docstring);
    #   bound 2e-3 (SLQ probe noise).
    # fastsum (default start): vs foo_0_loss_nfft.txt — an 11-entry trace
    #   from the DOCUMENTED (0,0,0) start (unlike the exact golden!); its
    #   first entry 0.53625 sits 3.6e-3 below the exact NLL 0.53985, i.e.
    #   the reference's own NFFT operator error.  Our folded-NDFT trace must
    #   match within the sum of the two operators' approximation errors
    #   (~1e-2) — locking in that the Fourier-accelerated training path
    #   follows the reference's NFFT run, not just the exact-dense one.
    trace_ok = True
    if which == "exact" and args.golden_start:
        m = min(len(losses), len(g_losses))
        dtrace = float(np.max(np.abs(losses[:m] - g_losses[:m])))
        print(f"golden trace parity over {m} iters (exact): "
              f"max|diff| = {dtrace:.2e}")
        trace_ok = dtrace < 2e-3
    elif which == "nfft" and not args.golden_start:
        # the committed nfft trace holds 10 iterations + a trailing 0.0
        # file artifact — strip the zero tail before comparing
        gl = g_losses[: int(np.max(np.nonzero(g_losses)[0])) + 1]
        m = min(len(losses), len(gl))
        dtrace = float(np.max(np.abs(losses[:m] - gl[:m])))
        print(f"golden trace parity over {m} iters (nfft, (0,0,0) start): "
              f"max|diff| = {dtrace:.2e}")
        print("  ours :", np.array2string(losses[:m], precision=4))
        print("  golden:", np.array2string(gl[:m], precision=4))
        trace_ok = dtrace < 1e-2

    # 2./3. prediction parity
    ystd = float(np.std(g_labels))
    rmse_ours = float(np.sqrt(np.mean((pred - g_labels) ** 2))) / ystd
    rmse_golden = float(np.sqrt(np.mean((g_preds - g_labels) ** 2))) / ystd
    rmse_vs_golden = float(np.sqrt(np.mean((pred - g_preds) ** 2))) / ystd
    print(f"test RMSE/std : ours {rmse_ours:.4f}  golden {rmse_golden:.4f}")
    print(f"ours-vs-golden prediction RMSE/std (informational): {rmse_vs_golden:.4f}")

    ok = d_loss0 < 5e-3 and trace_ok  # SLQ noise with 10 probes
    if not args.quick:
        ok = ok and rmse_ours <= rmse_golden * 1.10
    print("PARITY:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
