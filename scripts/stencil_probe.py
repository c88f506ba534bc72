"""Probe: irregular-memory op costs vs the cell-stencil dense forms (r5).

Measures on the real chip, at AFN-apply shapes (n=1e5, lfil=16):
  1. element gather (n, lfil)            -- the r4 ELL apply cost
  2. broadcast row-gather (n,8) trick    -- current ell_matvec path
  3. scatter-add (n, lfil)               -- current ell_rmatvec cost
  4. permutation row gather/scatter (n,) -- the cell-order round-trip cost
  5. stencil apply: 9 shifted slices + (ncell, c, 9c) einsum (no gathers)
  6. one-hot ELL->stencil embed (setup-time cost)
  7. column-gather GK12[:, J] vs row-gather GK12.T[J]  (AFN setup cost)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n, lfil = 100_000, 16
reps = 50
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, n, size=(n, lfil)), jnp.int32)
val = jnp.asarray(rng.normal(size=(n, lfil)), jnp.float32)
x = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
perm = jnp.asarray(rng.permutation(n), jnp.int32)

def timed(name, fn, *args):
    f = jax.jit(fn)
    try:
        r = jax.block_until_ready(f(*args))
    except Exception as e:
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:34s} {dt:8.3f} ms", flush=True)

timed("element gather x[idx]", lambda x, i: jnp.sum(x[i] * val, axis=1), x, idx)

def bcast_gather(x, i):
    x2 = jnp.broadcast_to(x[:, None], (n, 8))
    return jnp.sum(x2[i.reshape(-1)][:, 0].reshape(i.shape) * val, axis=1)
timed("bcast row-gather (n,8)", bcast_gather, x, idx)

timed("scatter-add rmatvec",
      lambda x, i: jnp.zeros((n,), x.dtype).at[i.reshape(-1)].add(
          (val * x[:, None]).reshape(-1)), x, idx)

timed("perm row gather x[perm]", lambda x, p: x[p], x, perm)
timed("perm scatter .at[perm].set", lambda x, p: jnp.zeros_like(x).at[p].set(x), x, perm)
# permutation as (n,8) broadcast row gather
def perm8(x, p):
    x2 = jnp.broadcast_to(x[:, None], (n, 8))
    return x2[p][:, 0]
timed("perm row gather (n,8) bcast", perm8, x, perm)

# 5. stencil apply: ncx=ncy=80, c=16 (n=1e5 -> mean 15.6/cell)
ncy = ncx = 80
c = 24
A = jnp.asarray(rng.normal(size=(ncy, ncx, c, 9 * c)), jnp.float32)
xc = jnp.asarray(rng.normal(size=(ncy, ncx, c)), jnp.float32)

def stencil_apply(A, xc):
    xp = jnp.pad(xc, ((1, 1), (1, 1), (0, 0)))
    nbr = jnp.concatenate(
        [xp[1 + dy : 1 + dy + ncy, 1 + dx : 1 + dx + ncx, :]
         for dy in (-1, 0, 1) for dx in (-1, 0, 1)], axis=2)   # (ncy,ncx,9c)
    return jnp.einsum("yxij,yxj->yxi", A, nbr)
timed(f"stencil apply c={c} (57MB A)", stencil_apply, A, xc)

def stencil_apply_vpu(A, xc):
    xp = jnp.pad(xc, ((1, 1), (1, 1), (0, 0)))
    nbr = jnp.concatenate(
        [xp[1 + dy : 1 + dy + ncy, 1 + dx : 1 + dx + ncx, :]
         for dy in (-1, 0, 1) for dx in (-1, 0, 1)], axis=2)
    return jnp.sum(A * nbr[:, :, None, :], axis=3)
timed("stencil apply (bcast-reduce)", stencil_apply_vpu, A, xc)

Ab = A.astype(jnp.bfloat16)
def stencil_apply_bf16(A, xc):
    xp = jnp.pad(xc, ((1, 1), (1, 1), (0, 0)))
    nbr = jnp.concatenate(
        [xp[1 + dy : 1 + dy + ncy, 1 + dx : 1 + dx + ncx, :]
         for dy in (-1, 0, 1) for dx in (-1, 0, 1)], axis=2).astype(jnp.bfloat16)
    return jnp.einsum("yxij,yxj->yxi", A, nbr, preferred_element_type=jnp.float32)
timed("stencil apply bf16 tables", stencil_apply_bf16, Ab, xc)

# 6. one-hot embed: val (n', lfil) -> (n', 9c) via slot comparison
npts = ncy * ncx * c
slot_of = jnp.asarray(rng.integers(0, 9 * c, size=(npts, lfil)), jnp.int32)
vals2 = jnp.asarray(rng.normal(size=(npts, lfil)), jnp.float32)
def embed(v, s):
    t = jnp.arange(9 * c, dtype=jnp.int32)
    oh = (s[:, :, None] == t[None, None, :]).astype(v.dtype)
    return jnp.einsum("ns,nst->nt", v, oh)
timed("one-hot ELL->stencil embed", embed, vals2, slot_of)

# 7. AFN setup gathers: GK12 column gather vs transposed row gather
k = 200
chunk = 32768
GK = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
GKT = GK.T
Jc = idx[:chunk]
timed("col gather GK12[:, J] 1 chunk", lambda G, J: G[:, J], GK, Jc)
timed("row gather GK12.T[J] 1 chunk", lambda G, J: G[J], GKT, Jc)
