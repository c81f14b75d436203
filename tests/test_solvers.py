

def test_verify_final_symmetric_family():
    # every symmetric-family solver reports a post-solve verified true
    # residual; with a shift the certificate is ||b - (A - shift I) x||
    import numpy as np
    import jax.numpy as jnp
    from pykrylov_tpu.solvers import cg, minres, symmlq
    from pykrylov_tpu.ops import MatrixOperator

    rng = np.random.default_rng(77)
    n = 60
    q = rng.standard_normal((n, n))
    a = q @ q.T + 5 * np.eye(n)
    b = a @ np.ones(n)
    A = MatrixOperator(jnp.asarray(a))
    shift = 0.5

    res = cg(A, jnp.asarray(b), rtol=1e-12, verify_final=True)
    rt = b - a @ np.asarray(res.x)
    assert abs(float(res.info["true_resid_norm"])
               - np.linalg.norm(rt)) < 1e-9 * np.linalg.norm(b)

    for solver in (minres, symmlq):
        r2 = solver(A, jnp.asarray(b), shift=shift, rtol=1e-12,
                    verify_final=True)
        rt = b - (a - shift * np.eye(n)) @ np.asarray(r2.x)
        assert abs(float(r2.info["true_resid_norm"])
                   - np.linalg.norm(rt)) < 1e-9 * np.linalg.norm(b), solver
        assert float(r2.info["true_resid_norm"]) < 1e-6 * np.linalg.norm(b)
