'''
Device-side source injection and receiver extraction from Kaiser stamps.

The reference materializes sources/receivers as SciPy sparse matrices and
applies them with sparse matvecs (zephyr/backend/source.py:315-317,
zephyr/middleware/survey.py:109-128). On TPU, sparse matrices don't
exist; instead the (geometry-static) Kaiser stamps become padded index/
value arrays used with scatter-add (injection) and gather (extraction) —
both differentiable and jit/vmap/shard_map-compatible. For production
grids (2048^2, 100+ receivers) gather extraction avoids the dense
(nrec, nz*nx) matrix entirely.
'''

import numpy as np

import jax.numpy as jnp


def pad_stamps(rows, cols, vals, n, pad_to=None):
    '''
    Convert flat COO-style stamps (from SparseKaiserSource.stamps) into
    padded per-entity arrays.

    Args:
        rows, cols, vals: flat arrays; rows[i] in [0, n)
        n: number of sources/receivers
        pad_to: stamp capacity (default: max entries per entity)

    Returns:
        (cols_padded (n, K) int32, vals_padded (n, K) complex64/128)
        with zero-value padding (indices clamped to 0).
    '''

    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    counts = np.bincount(rows.astype(np.int64), minlength=n)
    K = int(pad_to or (counts.max() if counts.size else 1))

    cols_p = np.zeros((n, K), dtype=np.int32)
    vals_p = np.zeros((n, K), dtype=vals.dtype)
    cursor = np.zeros(n, dtype=np.int64)
    for r, c, v in zip(rows, cols, vals):
        k = cursor[r]
        cols_p[r, k] = c
        vals_p[r, k] = v
        cursor[r] += 1
    # host numpy out: complex host->device transfer is unimplemented on
    # the axon TPU runtime, so device placement is the CALLER's choice
    # (realio.to_device_complex / device_put_c for the re/im boundary)
    return cols_p, vals_p


def inject(cols, vals, nz, nx):
    '''
    Build dense source fields from padded stamps:
    (n, K) -> (n, nz, nx) via scatter-add. Differentiable w.r.t. vals.
    '''

    n, K = cols.shape
    fields = jnp.zeros((n, nz * nx), dtype=vals.dtype)
    fields = fields.at[jnp.arange(n)[:, None], cols].add(vals)
    return fields.reshape((n, nz, nx))


def extract(u, cols, vals):
    '''
    Receiver extraction by gather: u is a wavefield of shape
    (..., nz, nx); cols/vals are padded stamps (nrec, K). Returns
    (..., nrec) complex data. Differentiable w.r.t. both u and vals.
    '''

    flat = u.reshape(u.shape[:-2] + (u.shape[-2] * u.shape[-1],))
    gathered = flat[..., cols]              # (..., nrec, K)
    return jnp.sum(gathered * vals, axis=-1)
