'''
Tracing and profiling for zephyr_tpu.

The reference's only instrumentation is SimPEG's @timeIt/@count
decorators on Jvec/Jtvec/dpred (zephyr/middleware/problem.py:87,124;
survey.py:140,190). Here profiling is a first-class subsystem:
- ``timeIt`` / ``count``: drop-in decorators with aggregated reporting
- ``trace``: context manager around jax.profiler for on-device traces
  viewable in TensorBoard/Perfetto
- ``annotate``: named regions that show up in device traces
'''

import atexit
import contextlib
import functools
import time
from collections import defaultdict

_STATS = defaultdict(lambda: {'calls': 0, 'total': 0.0, 'max': 0.0})
_REPORT_AT_EXIT = False


def timeIt(fn):
    'Decorator: accumulate wall-clock stats per function.'

    key = getattr(fn, '__qualname__', fn.__name__)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        try:
            return fn(*args, **kwargs)
        finally:
            dt = time.perf_counter() - t0
            st = _STATS[key]
            st['calls'] += 1
            st['total'] += dt
            st['max'] = max(st['max'], dt)

    return wrapper


def count(fn):
    'Decorator: count invocations.'

    key = getattr(fn, '__qualname__', fn.__name__)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        _STATS[key]['calls'] += 1
        return fn(*args, **kwargs)

    return wrapper


def stats():
    'A copy of the accumulated timing statistics.'
    return {k: dict(v) for k, v in _STATS.items()}


def report():
    'Print the accumulated timing statistics.'
    if not _STATS:
        return
    width = max(len(k) for k in _STATS)
    print('%-*s %8s %12s %12s' % (width, 'function', 'calls',
                                  'total (s)', 'max (s)'))
    for key in sorted(_STATS, key=lambda k: -_STATS[k]['total']):
        st = _STATS[key]
        print('%-*s %8d %12.4f %12.4f'
              % (width, key, st['calls'], st['total'], st['max']))


def report_at_exit():
    global _REPORT_AT_EXIT
    if not _REPORT_AT_EXIT:
        atexit.register(report)
        _REPORT_AT_EXIT = True


@contextlib.contextmanager
def trace(logdir='/tmp/zephyr_tpu_trace'):
    'Capture an on-device jax.profiler trace around a code block.'
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name):
    'Named region visible in device traces.'
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
