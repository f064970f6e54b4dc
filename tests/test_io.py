'''
I/O layer: SEG-Y reader/writer roundtrip (incl. IBM floats), .utout
Fortran records, the OMEGA .ini parser, time/frequency utilities, and the
FullwvDatastore end-to-end with a synthetic project.
'''

import os

import numpy as np
import pytest

from zephyr_tpu.middleware import (SEGYFile, writeSEGY, UtoutWriter,
                                   utoutRead, readini, TimeMachine,
                                   dftreal, idftreal, FullwvDatastore,
                                   FlatDatastore, PickleDatastore)

REF_INI = '/root/reference/notebooks/Time Comprehensive/xhlayr.ini'
REF_VP = '/root/reference/notebooks/Time Comprehensive/xhlayr.vp'


def test_segy_roundtrip_ieee(tmp_path):
    rng = np.random.default_rng(0)
    traces = rng.standard_normal((7, 120)).astype(np.float32)
    fn = str(tmp_path / 'test.sgy')
    writeSEGY(fn, traces, format=5)
    sf = SEGYFile(fn)
    assert (sf.ntr, sf.ns) == (7, 120)
    assert np.allclose(sf[:], traces, atol=1e-6)
    assert np.allclose(sf[2], traces[2], atol=1e-6)


def test_segy_roundtrip_ibm(tmp_path):
    rng = np.random.default_rng(1)
    traces = rng.standard_normal((3, 50)) * 1000
    fn = str(tmp_path / 'ibm.sgy')
    writeSEGY(fn, traces, format=1)
    sf = SEGYFile(fn)
    assert sf.format == 1
    assert np.allclose(sf[:], traces, rtol=1e-6)


def test_utout_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    nrec, nsrc, nf = 5, 3, 4
    data = (rng.standard_normal((nrec, nsrc, nf))
            + 1j * rng.standard_normal((nrec, nsrc, nf)))
    freqs = [10., 20., 30., 40.]
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        utow = UtoutWriter({'projnm': 'proj', 'freqs': freqs})
        utow(data)
        rfreqs, rdata = utoutRead('proj.utout', nrec)
    finally:
        os.chdir(cwd)
    assert np.allclose(rfreqs.real, 2 * np.pi * np.asarray(freqs),
                       rtol=1e-5)
    assert np.allclose(rdata, data, atol=1e-5)


def test_dft_roundtrip():
    rng = np.random.default_rng(3)
    ns = 64
    a = rng.standard_normal((2, ns))
    tm = TimeMachine({'freqs': list(np.arange(1, ns // 2 + 1))})
    A = tm.dft(a)
    assert A.shape == (2, ns)  # full-length output (reference behaviour)
    a2 = tm.idft(A[:, 1:ns // 2 + 1])
    # idft reconstructs the signal exactly up to the (dropped) DC term
    a_nodc = a - a.mean(axis=1, keepdims=True)
    assert np.allclose(a2, a_nodc, atol=1e-10)


def test_keuper_wavelet():
    tm = TimeMachine({'freqs': list(np.linspace(10., 500., 50)),
                      'freqBase': 50.})
    w = tm.keuper()
    assert w.shape == (tm.ns,)
    assert np.abs(w).max() > 0
    spectrum = tm.fSource(w)
    assert spectrum.shape == (1, tm.nom)


@pytest.mark.skipif(not os.path.exists(REF_INI),
                    reason='reference fixture not mounted')
def test_readini_reference_fixture():
    'Parse the OMEGA-era fixture shipped with the reference.'
    cwd = os.getcwd()
    os.chdir(os.path.dirname(REF_INI))
    try:
        ini = readini(os.path.basename(REF_INI))
    finally:
        os.chdir(cwd)
    assert ini['nx'] == 100 and ini['nz'] == 200
    assert ini['dx'] == 1.0 and ini['dz'] == 1.0
    assert ini['nom'] == 50
    assert len(ini['freqs']) == 50
    assert ini['freqs'][0] == 10.0 and ini['freqs'][-1] == 500.0
    assert ini['ns'] == 86 and ini['srcs'].shape[0] == 86
    assert ini['tau'] == 999.999
    assert ini['freqbase'] == 50.0


@pytest.mark.skipif(not os.path.exists(REF_VP),
                    reason='reference fixture not mounted')
def test_segy_reads_reference_model():
    'Read the OMEGA-era velocity model shipped with the reference.'
    sf = SEGYFile(REF_VP)
    model = sf[:]
    assert model.shape[0] in (100, 200)
    assert 500 < np.abs(model).max() < 10000  # plausible velocities


def _write_mini_ini(path, nx, nz, freqs, srcs, recs):
    'Emit a minimal OMEGA-layout ini for datastore tests.'

    def fmt_block(vals):
        lines = []
        for i in range(0, len(vals), 5):
            lines.append(' '.join('%0.6E' % v for v in vals[i:i + 5]))
        return lines

    lines = [
        '<comment><lessfiles>',
        '   0           F',
        '< nx >  < nz >  <    dx    >  <    dz    >  <  xorig   >  <  zorig   >',
        '   %d     %d      1.0000        1.0000        0.0000        0.0000'
        % (nx, nz),
        '<inv> <datain> <dataout> <waveout> <usescratch> <nom> <nsam> < tau > <nftout>',
        " F     'null '   'ftotl'        10  F              %d    100 999.999       0"
        % len(freqs),
        '<we> <param> <nky> <method> < vmin > <deltatt> <src> <wavscale> <aniso> < freqbase>',
        "'p '       2     1        1 2000.000    1.0000   1           F   0.0000  5.0000E+01",
        '<reduce>< redvel >< tbegin ><fst fsr fsb fsl><sponge><isufx>',
        ' F           0.000     0.000   F   F   F   F     F       0',
        '<   freq    >',
    ]
    lines += fmt_block(freqs)
    lines += ['<     ky    >'] + fmt_block([0.0])
    lines += ['<nslices>', '        0', '<slice> <source> <time>']
    lines += ['<ns> <isreg> <sspread> <useswt>',
              '  %d       4     0.500  F' % len(srcs),
              '<source>  <xs>         <zs>         <swght>']
    for i, (x, z) in enumerate(srcs):
        lines.append('  %d  %0.5E  %0.5E   1.000' % (i + 1, x, z))
    lines += ['<nr> <irreg> <rspread> <userwt>',
              '  %d       4     0.500  F' % len(recs),
              '<rec>  <xr>         <zr>         <rwght>']
    for i, (x, z) in enumerate(recs):
        lines.append('  %d  %0.5E  %0.5E   1.000' % (i + 1, x, z))
    lines += ['<ng> <igreg> <gspread> <usegwt>',
              '  0       4     0.500  F',
              '<geo>  <xg>         <zg>         <gwght>']
    lines += ['<sghost> <rghost> <gghost> <zgg>',
              ' F   F   F   0.0',
              '<zero1>',
              ' 0 0 0 0',
              ' 0 0 0 0']
    with open(path, 'w') as fp:
        fp.write('\n'.join(lines) + '\n')


def test_fullwv_datastore_synthetic(tmp_path):
    'FullwvDatastore assembles a systemConfig from a synthetic project.'

    nx, nz = 40, 30
    freqs = [50., 100., 150., 200.]
    srcs = [(5., 5.), (10., 5.)]
    recs = [(5., 25.), (15., 25.), (25., 25.)]
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        _write_mini_ini('proj.ini', nx, nz, freqs, srcs, recs)
        model = 2000. * np.ones((nx, nz))  # SEG-Y: one trace per x
        writeSEGY('proj.vp', model, format=5)
        ds = FullwvDatastore('proj')
        sc = ds.systemConfig
    finally:
        os.chdir(cwd)

    assert sc['nx'] == nx and sc['nz'] == nz
    assert list(sc['freqs']) == freqs
    assert sc['tau'] == np.inf
    assert sc['c'].shape == (nz, nx)
    assert np.allclose(sc['c'], 2000.)
    assert sc['geom']['src'].shape == (2, 2)
    assert sc['geom']['rec'].shape == (3, 2)
    assert sc['ireg'] == 4
    assert sc['freeSurf'] == (False, False, False, False)


def test_flat_and_pickle_datastores(tmp_path):
    import pickle
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        with open('flatproj.py', 'w') as fp:
            fp.write('systemConfig = {"nx": 10, "nz": 20, "c": 1500.}\n')
        ds = FlatDatastore('flatproj')
        assert ds.systemConfig['nx'] == 10

        with open('pickproj.pickle', 'wb') as fp:
            pickle.dump({'nx': 7, 'nz': 9}, fp)
        ds2 = PickleDatastore('pickproj')
        assert ds2.systemConfig['nz'] == 9
    finally:
        os.chdir(cwd)


def test_timeslice_reconstruction():
    '''
    timeSlice must reconstruct a time signal from its per-frequency
    spectrum (the reference left this as NotImplementedError).
    '''
    nfreq = 16
    freqs = list(np.arange(1, nfreq + 1) * 2.0)   # 2..32 Hz
    tm = TimeMachine({'freqs': freqs})
    # synthesize a band-limited signal from known coefficients
    rng = np.random.default_rng(4)
    coeffs = rng.standard_normal(nfreq) + 1j * rng.standard_normal(nfreq)
    taus = np.arange(tm.ns) * tm.dt
    truth = np.zeros(tm.ns)
    for fc, f in zip(coeffs, freqs):
        truth += (2.0 / tm.ns) * np.real(
            np.conj(fc) * np.exp(2j * np.pi * f * taus))
    # uF laid out (nfreq, ...) as the solver produces
    recon = tm.timeSlice(coeffs.reshape(nfreq, 1))[:, 0]
    assert np.allclose(recon, truth, atol=1e-10)


def test_fft_matches_dft():
    'The FFT fast path must match the explicit Vandermonde DFT.'
    rng = np.random.default_rng(6)
    ns = 32
    a = rng.standard_normal((3, ns))
    tm = TimeMachine({'freqs': list(np.arange(1, ns // 2 + 1))})
    A_dft = tm.dft(a)[:, :ns // 2]
    A_fft = tm.fft(a)
    assert np.allclose(A_fft, A_dft, atol=1e-12)
