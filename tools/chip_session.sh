#!/bin/bash
# One-shot on-chip validation session, staged while the axon tunnel was
# down.  Run from the repo root when the tunnel recovers:
#   bash tools/chip_session.sh 2>&1 | tee /tmp/chip_session.log
# Each leg runs under its own timeout so a hang cannot eat the session.
set -x
cd "$(dirname "$0")/.."

echo "=== leg 0: tunnel health ==="
timeout 120 python -c "
import jax, jax.numpy as jnp, time
t0=time.time(); x=jnp.ones((256,256)); (x@x).block_until_ready()
print('health OK', jax.devices()[0], '%.1fs' % (time.time()-t0))" || exit 1

echo "=== leg 1: bench.py (headline DIA + BELL sections) ==="
timeout 580 python bench.py

echo "=== leg 2: probe_idx8 (BELL int8-idx A/B; flip default if >= parity) ==="
timeout 580 python tools/probes/probe_idx8.py

echo "=== leg 3: verify drive (library surface on the chip) ==="
# mirrors __graft_entry__.entry(): Jacobi-ACCELERATED verified CG whose
# stopping/verification run on the UNPRECONDITIONED residual at rtol 1e-6
# (the unpreconditioned f32 recurrence needs >> 2n iterations on this
# kappa~1e7 system; the round-1 bare-replacement leg hit the default cap)
timeout 400 python - <<'PYEOF'
import numpy as np, jax.numpy as jnp
import pykrylov_tpu as pk
from pykrylov_tpu.io.datasets import load_bundled
from pykrylov_tpu.sparse import jacobi_preconditioner
vals, rows, cols, shape = load_bundled("1138bus")
op = pk.sparse.sparse_operator(
    (vals.astype(np.float32), rows, cols, shape), symmetric=True)
M = jacobi_preconditioner("1138bus")
a = np.zeros(shape); np.add.at(a, (rows, cols), vals)
b64 = a @ np.ones(shape[0])
res = pk.solvers.cg(op, jnp.asarray(b64, jnp.float32), M=M,
                    rtol=1e-6, atol=0.0, maxiter=20000, replace_every=1000)
x = np.asarray(res.x, np.float64) + np.asarray(res.info["x_lo"], np.float64)
rel = np.linalg.norm(a @ x - b64) / np.linalg.norm(b64)
print("ff-CG 1138bus: converged=%s iters=%d true relres=%.2e"
      % (bool(res.converged), int(res.n_iter), rel))
assert bool(res.converged) and rel < 2e-6
PYEOF

echo "=== leg 4: batched-vs-sequential CG speedup (block amortization) ==="
timeout 580 python - <<'PYEOF'
import time, numpy as np, jax, jax.numpy as jnp
import pykrylov_tpu as pk
from pykrylov_tpu.gallery.poisson import poisson3d_coo
from pykrylov_tpu.sparse import formats as F
n = 96
vals, rows, cols, shape = poisson3d_coo(n, dtype=np.float32)
op = pk.sparse.sparse_operator(
    (vals/12.0, rows, cols, shape), symmetric=True, fmt="dia")
m = shape[0]
K = 8
rng = np.random.default_rng(0)
B = jnp.asarray(rng.standard_normal((m, K)), jnp.float32)
r1 = pk.solvers.cg_batched(op, B, rtol=1e-5, maxiter=300)
jax.block_until_ready(r1.x); t0 = time.perf_counter()
r1 = pk.solvers.cg_batched(op, B, rtol=1e-5, maxiter=300)
float(r1.x[0, 0]); t_block = time.perf_counter() - t0
r0 = pk.solvers.cg(op, B[:, 0], rtol=1e-5, maxiter=300)
float(r0.x[0]); t0 = time.perf_counter()
for j in range(K):
    rj = pk.solvers.cg(op, B[:, j], rtol=1e-5, maxiter=300)
    float(rj.x[0])
t_seq = time.perf_counter() - t0
print("m=%d K=%d: block %.3fs (%d iters), sequential %.3fs -> %.2fx"
      % (m, K, t_block, int(r1.n_iter), t_seq, t_seq / t_block))
PYEOF
echo "=== chip session done ==="
