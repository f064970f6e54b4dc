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


@pytest.mark.slow
def test_cli_invert_and_migrate(project):
    'invert and migrate against observed utobs data files.'
    from zephyr_tpu.frontend.jobs import OmegaJob

    # make observed data from a perturbed model, then reset the start model
    true_model = 2000. * np.ones((40, 30))
    true_model[12:20, 10:18] -= 150.
    writeSEGY('demo.vp', true_model, format=5)
    data = OmegaJob('demo').run()
    for i, f in enumerate([50., 100.]):
        panel = data[:, :, i]
        inter = np.empty((2 * panel.shape[1], panel.shape[0]))
        inter[0::2] = panel.T.real
        inter[1::2] = panel.T.imag
        writeSEGY('demo.utobs%0.3f' % f, inter, format=5)
    writeSEGY('demo.vp', 2000. * np.ones((40, 30)), format=5)

    runner = CliRunner()
    r = runner.invoke(zephyr, ['migrate', 'demo'])
    assert r.exit_code == 0, r.output
    assert os.path.exists('demo1.gvp')
    from zephyr_tpu.middleware.segy import SEGYFile
    img = SEGYFile('demo1.gvp')[:].T
    assert np.abs(img).max() > 0

    r = runner.invoke(zephyr, ['invert', 'demo', '--maxiter', '2'])
    assert r.exit_code == 0, r.output
    assert os.path.exists('demo1.vp')

    r = runner.invoke(zephyr, ['clean', 'demo', '--yes'])
    assert r.exit_code == 0, r.output
    assert not os.path.exists('demo1.vp')
    assert not os.path.exists('demo.utout')


REF_INI = '/root/reference/notebooks/Time Comprehensive/xhlayr.ini'
REF_VP = '/root/reference/notebooks/Time Comprehensive/xhlayr.vp'


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(REF_INI),
                    reason='reference xhlayr fixture not mounted')
def test_omega_job_on_reference_project(tmp_path):
    '''
    The reference's OWN OMEGA project (notebooks/Time Comprehensive/
    run.py runs OmegaJob('xhlayr') against these files) modelled
    end-to-end: ini + SEG-Y velocity in, one mid-band frequency solved
    for all 86 sources, .utout written and read back.
    '''

    import shutil

    from zephyr_tpu.middleware import FullwvDatastore

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        shutil.copy(REF_INI, 'xhlayr.ini')
        shutil.copy(REF_VP, 'xhlayr.vp')
        sc = FullwvDatastore('xhlayr').systemConfig
        assert len(sc['freqs']) == 50
        assert len(sc['geom']['src']) == 86
        # (xhlayr ships no .src wavelet file, so there are no per-freq
        # sterms to subset — the survey defaults them to ones.) One
        # mid-band frequency and 8 of the 86 sources keep the test
        # within the slow-suite budget on CPU/x64.
        sub = {'freqs': [sc['freqs'][19]],              # 200 Hz
               'geom': dict(sc['geom'], src=sc['geom']['src'][:8]),
               'solverOpts': dict(tol=1e-5, maxiter=400,
                                  mg_coarse='inv')}
        job = OmegaJob('xhlayr', supplementalConfig=sub)
        data = job.run()
        assert np.isfinite(data).all()
        assert os.path.exists('xhlayr.utout')
        freqs, d = utoutRead('xhlayr.utout', nrec=data.shape[0])
        assert d.shape[2] == 1
        assert np.allclose(np.real(freqs[0]), 2 * np.pi * 200., rtol=1e-5)
        assert np.isfinite(d).all() and np.abs(d).max() > 0
    finally:
        os.chdir(cwd)
