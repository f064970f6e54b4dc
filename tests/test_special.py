'''
On-device special functions vs scipy (the reference reaches these through
scipy.special; see SURVEY.md section 2.4).
'''

import numpy as np
import jax.numpy as jnp
from scipy.special import hankel1, i0 as scipy_i0, j0 as scipy_j0, \
    y0 as scipy_y0

from zephyr_tpu.ops.special import (bessel_j0, bessel_y0, hankel1_0,
                                    bessel_i0)


def test_j0_matches_scipy():
    x = np.linspace(0.0, 80.0, 4001)
    ours = np.asarray(bessel_j0(jnp.asarray(x)))
    ref = scipy_j0(x)
    assert np.max(np.abs(ours - ref)) < 2e-8


def test_y0_matches_scipy():
    x = np.linspace(1e-3, 80.0, 4001)
    ours = np.asarray(bessel_y0(jnp.asarray(x)))
    ref = scipy_y0(x)
    assert np.max(np.abs(ours - ref)) < 2e-8


def test_hankel1_0_matches_scipy():
    x = np.linspace(0.01, 60.0, 2000)
    ours = np.asarray(hankel1_0(jnp.asarray(x)))
    ref = hankel1(0, x)
    assert np.max(np.abs(ours - ref) / np.abs(ref)) < 1e-7


def test_i0_matches_scipy():
    x = np.linspace(0.0, 15.0, 500)
    ours = np.asarray(bessel_i0(jnp.asarray(x)))
    ref = scipy_i0(x)
    assert np.max(np.abs(ours - ref) / ref) < 1e-12
