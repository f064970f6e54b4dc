'''
Wavefield container for frequency-domain problems.

Reference parity: zephyr/middleware/fields.py (HelmFields): storage of
shape (nN, nSrc, nFreq) complex, indexed with 3-part keys
``u[src, 'u', ifreq]``. The SimPEG Fields machinery (alias fields, MRO
startup hooks) is reduced to the surface the reference actually exercises.
'''

import numpy as np


class HelmFields(object):
    '''
    Field storage for frequency-domain wavefields:
        u[:, 'u', ifreq] = wavefield panel (nN, nSrc)
        u[isrc, 'u', :]  -> (nN, nFreq) or (nN, nSrc, nFreq) slices
    '''

    knownFields = {'u': 'N'}
    dtype = np.complex128

    def __init__(self, mesh, survey):
        self.mesh = mesh
        self.survey = survey
        self._fields = {}

    @property
    def shape(self):
        return (self.mesh.nN, self.survey.nSrc, self.survey.nfreq)

    def _ensure(self, name):
        if name not in self._fields:
            self._fields[name] = np.zeros(self.shape, dtype=self.dtype)
        return self._fields[name]

    @staticmethod
    def _parseKey(key):
        if not isinstance(key, tuple):
            key = (key,)
        if len(key) == 1:
            key = key + ('u',)
        if len(key) == 2:
            key = key + (slice(None),)
        assert len(key) == 3, 'must be [Src, fieldName, freqs]'
        srcInd, name, freqInd = key
        return srcInd, name, freqInd

    def _srcIndex(self, srcInd):
        'Resolve HelmSrc instances / lists to integer indices.'
        srcList = self.survey.srcList
        if isinstance(srcInd, (slice, int, np.integer)):
            return srcInd
        if isinstance(srcInd, (list, tuple, np.ndarray)):
            return [self._srcIndex(s) for s in srcInd]
        return srcList.index(srcInd)

    def __setitem__(self, key, value):
        srcInd, name, freqInd = self._parseKey(key)
        field = self._ensure(name)
        srcInd = self._srcIndex(srcInd)
        target = field[:, srcInd, freqInd]
        field[:, srcInd, freqInd] = np.asarray(value).reshape(target.shape,
                                                             order='F')

    def __getitem__(self, key):
        srcInd, name, freqInd = self._parseKey(key)
        field = self._ensure(name)
        srcInd = self._srcIndex(srcInd)
        return field[:, srcInd, freqInd]

    def __repr__(self):
        nN, nSrc, nFreq = self.shape
        return ('<%s container at 0x%x: %d fields, with N shape '
                '(%d, %d, %d)>' % (self.__class__.__name__, id(self),
                                   len(self.knownFields), nN, nSrc, nFreq))
