'''
Frontend: composable jobs and the CLI, driven end-to-end against a
synthetic OMEGA project (mirroring the reference's
notebooks/Time Comprehensive/run.py workflow: OmegaJob over an ini+vp
project writing .utout).
'''

import os

import numpy as np
import pytest
from click.testing import CliRunner

from zephyr_tpu.frontend.cli import zephyr
from zephyr_tpu.frontend.jobs import OmegaJob
from zephyr_tpu.middleware import utoutRead
from zephyr_tpu.middleware.segy import writeSEGY

from test_io import _write_mini_ini


@pytest.fixture
def project(tmp_path):
    nx, nz = 40, 30
    srcs = [(5., 5.), (10., 5.)]
    recs = [(5., 25.), (15., 25.), (25., 25.)]
    cwd = os.getcwd()
    os.chdir(tmp_path)
    _write_mini_ini('demo.ini', nx, nz, [50., 100.], srcs, recs)
    writeSEGY('demo.vp', 2000. * np.ones((nx, nz)), format=5)
    yield 'demo'
    os.chdir(cwd)


def test_omega_job_end_to_end(project):
    job = OmegaJob(project)
    data = job.run()
    assert data.shape == (3, 2, 2)
    assert np.isfinite(data).all()
    assert os.path.exists('demo.utout')
    freqs, back = utoutRead('demo.utout', 3)
    assert back.shape == (3, 2, 2)
    assert np.allclose(back, data, atol=np.abs(data).max() * 1e-5)


def test_cli_inspect_and_model(project):
    runner = CliRunner()
    r = runner.invoke(zephyr, ['inspect', project])
    assert r.exit_code == 0, r.output
    assert 'Grid:        40 x 30' in r.output

    r = runner.invoke(zephyr, ['model', project])
    assert r.exit_code == 0, r.output
    assert os.path.exists('demo.utout')


def test_cli_pack_unpack(project):
    runner = CliRunner()
    r = runner.invoke(zephyr, ['pack', project])
    assert r.exit_code == 0, r.output
    assert os.path.exists('demo.pickle')
    r = runner.invoke(zephyr, ['unpack', project])
    assert r.exit_code == 0, r.output
    assert 'nx' in r.output
