'''
Multiscale FWI demo: frequency-continuation inversion with checkpointing.

This is BASELINE.md staged config 5 (the reference's Test Inversion /
MultiScale workflow): invert low-frequency blocks first, warm-starting
each block from the previous result, with orbax checkpoints and
FULLWV-style iteration-numbered model files written per block.

Run:  python examples/multiscale_fwi_demo.py
'''

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)

    import numpy as np
    from zephyr_tpu.backend import MiniZephyr
    from zephyr_tpu.middleware import (Helm2DProblem, Helm2DSurvey,
                                       FrequencyContinuation, LBFGS)
    from zephyr_tpu.utils import (InversionCheckpointer,
                                  save_fullwv_model)

    nz, nx = 80, 60
    c0 = 2000.
    freqs = [40., 60., 90., 130.]

    srcs = np.column_stack([np.full(8, 5.), np.linspace(5., nz - 5., 8)])
    recs = np.column_stack([np.full(16, nx - 5.),
                            np.linspace(5., nz - 5., 16)])
    sc = {
        'Disc': MiniZephyr,
        'nx': nx, 'nz': nz, 'dx': 1., 'dz': 1.,
        'c': c0 * np.ones((nz, nx)), 'rho': 1.,
        'freqs': freqs,
        'geom': {'src': srcs, 'rec': recs, 'mode': 'fixed'},
        'nPML': 8,
        'solverOpts': {'tol': 1e-7, 'maxiter': 400},
    }

    c_true = c0 * np.ones((nz, nx))
    c_true[32:48, 22:38] -= 200.

    print('Generating observed data over %d frequencies...' % len(freqs))
    sc_true = dict(sc, c=c_true)
    pt, st = Helm2DProblem(sc_true), Helm2DSurvey(sc_true)
    pt.pair(st)
    dobs = st.dpred().reshape(16, 8, len(freqs))

    ckpt = InversionCheckpointer('/tmp/zephyr_tpu_fwi_ckpt')

    driver = FrequencyContinuation(
        Helm2DProblem, Helm2DSurvey, sc, dobs,
        blocks=[[0, 1], [2, 3]],   # low block first, then high
        optFactory=lambda: LBFGS(maxIter=5, lower=c0 - 400.,
                                 upper=c0 + 400., print_progress=True))

    m = c0 * np.ones(nz * nx)
    print('\n=== frequency-continuation inversion ===')
    m = driver.run(m)

    for iblock, record in enumerate(driver.history):
        print('block %d (freqs %s): final misfit %.3e'
              % (iblock, record['block'], record['f']))
        ckpt.save(iblock, {'model': m.reshape(nz, nx),
                           'misfit': np.array(record['f']),
                           'block': np.array(iblock)})
        save_fullwv_model('msdemo', iblock + 1, m.reshape(nz, nx))

    step, state = ckpt.restore()
    print('checkpoint restore: step %s, misfit %.3e'
          % (step, float(state['misfit'])))

    dm = m.reshape(nz, nx) - c0
    inner = dm[34:46, 24:36].mean()
    print('recovered anomaly mean in true box: %+.1f m/s (true -200)'
          % inner)
    assert inner < -20., 'anomaly not recovered'
    print('multiscale FWI demo passed')


if __name__ == '__main__':
    main()
