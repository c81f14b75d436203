

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


def test_convdiff_gallery_nonsymmetric():
    # the generated nonsymmetric stencil: matvec == COO == dense oracle,
    # transpose exact, and the transpose-free family converges on it
    import numpy as np
    import jax.numpy as jnp
    from pykrylov_tpu.gallery import (convdiff2d_matvec, convdiff2d_coo,
                                      convdiff2d_operator)
    from pykrylov_tpu.solvers import bicgstab, cgs, tfqmr

    n = 24
    vals, rows, cols, shape = convdiff2d_coo(n)
    a = np.zeros(shape)
    np.add.at(a, (rows, cols), vals)
    assert np.abs(a - a.T).max() > 0.1          # genuinely nonsymmetric
    rng = np.random.default_rng(4)
    x = rng.standard_normal(n * n)
    np.testing.assert_allclose(
        np.asarray(convdiff2d_matvec(jnp.asarray(x))), a @ x,
        rtol=1e-12, atol=1e-10)
    op = convdiff2d_operator(n, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(x)), a @ x,
                               rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(np.asarray(op.T @ jnp.asarray(x)), a.T @ x,
                               rtol=1e-12, atol=1e-10)
    b = a @ np.ones(n * n)
    for solver in (bicgstab, cgs, tfqmr):
        res = solver(op, jnp.asarray(b), rtol=1e-10, verify_final=True)
        assert bool(res.converged), solver
        assert float(res.info["true_resid_norm"]) < 1e-7 * np.linalg.norm(b)
