'''
Forward-modelling demo: the reference's "Compare Solutions Homogeneous"
notebook as a script — MiniZephyr and Eurus against the analytical
Green's-function oracle, plus the viscoacoustic dispersion check from the
"Test Dispersion" notebook, with hard assertions.

Run:  python examples/forward_modelling_demo.py
'''

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def element_norm(arr):
    import numpy as np
    return np.sqrt((arr.conj() * arr).sum()).real / arr.size


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)

    import numpy as np
    from zephyr_tpu.backend import (MiniZephyr, Eurus, SimpleSource,
                                    StackedSimpleSource,
                                    AnalyticalHelmholtz, MultiFreq,
                                    ViscoMultiFreq, MiniZephyrHD)

    nx, nz, freq = 100, 200, 200.
    sloc = np.array([[25., 25.]])

    # --- MiniZephyr vs oracle ----------------------------------------------
    sc = {'c': 2500., 'rho': 1., 'nx': nx, 'nz': nz, 'freq': freq}
    uMZ = (MiniZephyr(sc) * SimpleSource(sc)(sloc)).ravel()
    uAH = np.asarray(AnalyticalHelmholtz(sc)(sloc))
    seg = (slice(40, 180), slice(40, 80))
    err = element_norm((uAH.reshape(nz, nx)[seg]
                        - uMZ.reshape(nz, nx)[seg])
                       / abs(uAH.reshape(nz, nx)[seg]))
    print('MiniZephyr vs analytical: %.2e  (reference tol 1e-2)' % err)
    assert err < 1e-2

    # --- Eurus (isotropic parameters) vs oracle -----------------------------
    scE = {'c': 2000. * np.ones((nz, nx)), 'rho': np.ones((nz, nx)),
           'freq': freq, 'nx': nx, 'nz': nz, 'dx': 1., 'dz': 1.,
           'theta': np.zeros((nz, nx)), 'eps': np.zeros((nz, nx)),
           'delta': np.zeros((nz, nx)), 'nPML': 10, 'cPML': 1e3}
    uE = (Eurus(scE) * StackedSimpleSource(scE)(sloc)).ravel()
    uAH2 = np.asarray(AnalyticalHelmholtz(scE)(sloc))
    errE = element_norm((uAH2.reshape(nz, nx)[seg]
                         - uE[:nz * nx].reshape(nz, nx)[seg])
                        / abs(uAH2.reshape(nz, nx)[seg]))
    print('Eurus (isotropic) vs analytical: %.2e  (reference tol 3e-2)'
          % errE)
    assert errE < 3e-2

    # --- viscoacoustic dispersion (Test Dispersion notebook) ----------------
    scV = {'Disc': MiniZephyrHD, 'c': 2500. * np.ones((nz, nx)),
           'rho': 1., 'nx': nx, 'nz': nz, 'freqs': [100., 200.]}
    q = SimpleSource(dict(scV, freq=100.))(sloc)
    u_elastic = MultiFreq(scV) * q
    u_visco = ViscoMultiFreq(dict(scV, Q=20., freqBase=200.)) * q
    shift = np.angle(np.vdot(u_elastic[0].ravel(),
                             u_visco[0].ravel()))
    print('Q=20 dispersion phase rotation at 100 Hz: %.3f rad '
          '(nonzero = causal dispersion active)' % shift)
    assert abs(shift) > 1e-3

    print('all forward-modelling checks passed')


if __name__ == '__main__':
    main()
