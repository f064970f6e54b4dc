'''
Checkpoint / resume for zephyr_tpu inversions.

The reference has no training-style checkpointing; its resume mechanism
is the FULLWV convention of iteration-numbered model files picked up by
the datastore regexes (zephyr/middleware/db.py:19-33). Both are provided:

- ``InversionCheckpointer``: orbax-backed checkpoints of the full FWI
  state (model, optimizer memory, frequency-block index, misfit history)
  with atomic saves and restore-latest.
- ``save_fullwv_model`` / ``latest_fullwv_model``: the OMEGA-era
  iteration-numbered SEG-Y convention, for interop with reference-style
  workflows.
'''

import glob
import os
import re

import numpy as np


class InversionCheckpointer(object):
    'Orbax-backed checkpointing of FWI state.'

    def __init__(self, directory):
        import orbax.checkpoint as ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, step):
        return os.path.join(self.directory, 'step_%08d' % step)

    def save(self, step, state):
        '''
        Args:
            step: integer step/iteration
            state: pytree (dict) of numpy/jax arrays and scalars
        '''
        self._ckptr.save(self._path(step), state, force=True)

    def steps(self):
        out = []
        for fn in glob.glob(os.path.join(self.directory, 'step_*')):
            m = re.match(r'.*step_(\d+)$', fn)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def restore(self, step=None):
        'Restore the given (or latest) step; returns (step, state).'
        steps = self.steps()
        if not steps:
            return None, None
        if step is None:
            step = steps[-1]
        return step, self._ckptr.restore(self._path(step))


def save_fullwv_model(projnm, iteration, model, key='vp'):
    '''
    Write an iteration-numbered model file (e.g. proj12.vp) in the
    FULLWV/OMEGA convention the datastore regexes recognize.
    '''
    from ..middleware.segy import writeSEGY
    fn = '%s%d.%s' % (projnm, iteration, key)
    writeSEGY(fn, np.asarray(model).T)  # SEG-Y stores one trace per x
    return fn


def latest_fullwv_model(projnm, key='vp'):
    'Find the latest iteration-numbered model file; returns (iter, path).'
    best = (-1, None)
    pattern = re.compile(r'^%s(\d+)\.%s$' % (re.escape(projnm),
                                             re.escape(key)))
    for fn in glob.glob('%s*.%s' % (projnm, key)):
        m = pattern.match(fn)
        if m:
            it = int(m.group(1))
            if it > best[0]:
                best = (it, fn)
    return best
