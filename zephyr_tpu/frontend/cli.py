'''
Command-line interface for zephyr_tpu.

Reference parity: zephyr/frontend/cli.py — the ``zephyr`` click command
group with subcommands clean / init / invert / inspect / migrate / model /
pack / unpack. In the reference only ``model`` was actually implemented
(cli.py:70-83); here ``model``, ``invert``, ``inspect``, ``clean``,
``pack`` and ``unpack`` are functional.
'''

import glob
import os
import pickle

import click


@click.group()
def zephyr():
    'A command-line interface for zephyr_tpu'


@click.command()
@click.argument('projnm')
@click.confirmation_option(
    prompt='Are you sure you want to clean project outputs?')
def clean(projnm):
    'Clean up project results / outputs'

    patterns = ['%s.utout' % projnm, '%s[0-9]*.vp' % projnm,
                '%s[0-9]*.gvp' % projnm, '%s.pickle.out' % projnm]
    removed = []
    for pattern in patterns:
        for fn in glob.glob(pattern):
            os.remove(fn)
            removed.append(fn)
    click.echo('Removed %d output files' % len(removed))
    for fn in removed:
        click.echo('\t%s' % fn)
zephyr.add_command(clean)


@click.command()
@click.argument('projnm')
@click.option('--storage', type=click.Choice(['dir', 'hdf5']),
              default='dir')
@click.option('--fromini', type=click.File())
def init(projnm, storage, fromini):
    'Set up a new modelling or inversion project'

    click.echo('Initializing project %s (storage: %s)' % (projnm, storage))
    if fromini is not None:
        with open('%s.ini' % projnm, 'w') as fp:
            fp.write(fromini.read())
        click.echo('Wrote %s.ini' % projnm)
zephyr.add_command(init)


@click.command()
@click.argument('projnm')
@click.option('--job', default='OmegaInversionJob', help='The job to run')
@click.option('--maxiter', default=10, help='Maximum FWI iterations')
def invert(projnm, job, maxiter):
    'Run an inversion project'

    from . import jobs
    jClass = getattr(jobs, job)
    assert issubclass(jClass, jobs.Job)
    j = jClass(projnm)
    if hasattr(j, 'maxIter'):
        j.maxIter = maxiter
    j.run()
zephyr.add_command(invert)


@click.command()
@click.argument('projnm')
def inspect(projnm):
    'Print information about an existing project'

    from ..middleware import FullwvDatastore

    ds = FullwvDatastore(projnm)
    sc = ds.systemConfig
    click.echo(repr(ds))
    click.echo('Grid:        %d x %d cells, dx=%g dz=%g'
               % (sc['nx'], sc['nz'], sc['dx'], sc['dz']))
    click.echo('Frequencies: %d (%g - %g Hz)'
               % (len(sc['freqs']), sc['freqs'][0], sc['freqs'][-1]))
    click.echo('Sources:     %d' % sc['geom']['src'].shape[0])
    click.echo('Receivers:   %d' % sc['geom']['rec'].shape[0])
    for key in ('c', 'Q', 'rho', 'eps', 'delta', 'theta'):
        if key in sc:
            import numpy as np
            v = np.asarray(sc[key])
            click.echo('Model %-6s shape %s, range [%g, %g]'
                       % (key, v.shape, v.min(), v.max()))
zephyr.add_command(inspect)


@click.command()
@click.argument('projnm')
@click.option('--job', default='OmegaMigrationJob', help='The job to run')
def migrate(projnm, job):
    'Run a migration (single adjoint-state gradient image)'

    from . import jobs
    jClass = getattr(jobs, job)
    assert issubclass(jClass, jobs.Job)
    jClass(projnm).run()
zephyr.add_command(migrate)


@click.command()
@click.argument('projnm')
@click.option('--job', default='OmegaJob', help='The job to run')
def model(projnm, job):
    'Run a forward model'

    from . import jobs

    jClass = getattr(jobs, job)
    assert issubclass(jClass, jobs.Job)

    j = jClass(projnm)
    j.run()
zephyr.add_command(model)


@click.command()
@click.argument('projnm')
def pack(projnm):
    'Collect project configuration into a portable pickle datafile'

    from ..middleware import FullwvDatastore

    ds = FullwvDatastore(projnm)
    sc = ds.systemConfig
    with open('%s.pickle' % projnm, 'wb') as fp:
        pickle.dump(sc, fp)
    click.echo('Packed %s -> %s.pickle' % (projnm, projnm))
zephyr.add_command(pack)


@click.command()
@click.argument('projnm')
def unpack(projnm):
    'Extract configuration from a packed datafile'

    with open('%s.pickle' % projnm, 'rb') as fp:
        sc = pickle.load(fp)
    click.echo('Unpacked %s.pickle: %d keys' % (projnm, len(sc)))
    for key in sorted(sc, key=str):
        click.echo('\t%s' % key)
zephyr.add_command(unpack)


if __name__ == '__main__':
    zephyr()
