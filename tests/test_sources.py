'''
Source classes, mirroring the reference's
zephyr/backend/Tests/test_Sources.py (clean execution; sparse == dense
Kaiser exactly; on-node Kaiser reduces to a delta within 1e-10).
'''

import numpy as np

from zephyr_tpu.backend import (SimpleSource, StackedSimpleSource,
                                SparseKaiserSource, KaiserSource,
                                AnisotropicKaiserSource)


def _elementNorm(arr):
    return np.sqrt((arr.conj() * arr).sum()).real / arr.size


LOC = np.array([[50., 50.], [25., 25.], [80., 80.], [25., 80.]])
CONFIG = {'nx': 100, 'nz': 100}


def test_cleanExecution():
    ss = SimpleSource(CONFIG)
    sss = StackedSimpleSource(CONFIG)
    sks = SparseKaiserSource(CONFIG)
    ks = KaiserSource(CONFIG)

    qss = ss(LOC)
    qsss = sss(LOC)
    qsks = sks(LOC)
    qks = ks(LOC)

    assert qss.shape == (100 * 100, 4)
    assert qsss.shape == (2 * 100 * 100, 4)
    assert qsks.shape == (100 * 100, 4)
    assert qks.shape == (100 * 100, 4)


def test_KaiserSource_sparse_equals_dense():
    sks = SparseKaiserSource(CONFIG)
    ks = KaiserSource(CONFIG)
    assert _elementNorm(sks(LOC).toarray() - ks(LOC)) == 0.


def test_KaiserSource_on_node_is_delta():
    config = dict(CONFIG, dx=1., dz=1.)
    ss = SimpleSource(config)
    ks = KaiserSource(config)
    assert _elementNorm(ks(LOC) - ss(LOC)) < 1e-10


def test_KaiserSource_offgrid_normalized():
    'Off-grid stamps should still integrate to ~1 (interior sources).'
    config = dict(CONFIG, dx=1., dz=1.)
    sks = SparseKaiserSource(config)
    q = sks(np.array([[50.3, 49.6]])).toarray()
    assert abs(q.sum() - 1.0) < 1e-2


def test_anisotropic_kaiser_runs():
    config = dict(CONFIG, theta=0.1, eps=0.2, delta=0.1)
    aks = AnisotropicKaiserSource(config)
    q = aks(LOC)
    assert q.shape == (100 * 100, 4)


def test_free_surface_mirroring():
    'A source near a free surface subtracts its image (reference 261-303).'
    config = dict(CONFIG, freeSurf=(False, False, True, False))
    sks = SparseKaiserSource(config)
    # source 2 cells below the top surface (z near nz-1 side is index 2?):
    # the reference mirrors when the stamp is clipped by the grid edge.
    q = sks(np.array([[50., 1.5]])).toarray()
    assert np.isfinite(q).all()
    # mirrored stamp must differ from the unmirrored one
    q2 = SparseKaiserSource(dict(CONFIG))(np.array([[50., 1.5]])).toarray()
    assert _elementNorm(q - q2) > 0


def test_device_stamps_match_sparse():
    'Padded-stamp inject/extract equals the sparse-matrix semantics.'
    import jax.numpy as jnp
    from zephyr_tpu.ops.kaiser import pad_stamps, inject, extract

    config = dict(CONFIG, freeSurf=(False, True, True, False))
    sks = SparseKaiserSource(config)
    locs = np.array([[7.3, 9.6], [50., 50.], [2.1, 3.4], [98.6, 97.2]])
    q_sparse = np.asarray(sks(locs).todense())         # (nrow, nsrc)

    rows, cols, vals = sks.stamps(locs)
    cols_p, vals_p = pad_stamps(rows, cols, vals, len(locs))

    # injection: dense fields match the sparse columns
    fields = np.asarray(inject(cols_p, vals_p, 100, 100))
    assert np.allclose(fields.reshape(4, -1).T, q_sparse, atol=1e-14)

    # extraction: gather output equals the sparse matvec q^T u
    rng = np.random.default_rng(8)
    u = rng.standard_normal((100, 100)) + 1j * rng.standard_normal((100, 100))
    d_gather = np.asarray(extract(jnp.asarray(u), cols_p, vals_p))
    d_sparse = q_sparse.T @ u.ravel()
    assert np.allclose(d_gather, d_sparse, atol=1e-12)
