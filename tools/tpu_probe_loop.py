'''
Loop-probe the axon TPU tunnel until it answers, then exit 0.

Each probe runs `jax.devices()` in a fresh subprocess with a hard
timeout (the wedged runtime hangs at backend init indefinitely; see
bench.py _probe_device). On success writes /tmp/tpu_ok with the
platform string and exits; otherwise sleeps and retries. Bounded by
--max-hours so it never outlives a round.
'''

import argparse
import subprocess
import sys
import time

PROBE = "import jax\nprint('PLATFORM:' + jax.devices()[0].platform)"


def probe_once(timeout_s):
    try:
        proc = subprocess.run([sys.executable, '-c', PROBE],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None
    for line in proc.stdout.splitlines():
        if line.startswith('PLATFORM:'):
            return line.split(':', 1)[1]
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--interval', type=float, default=150.0)
    ap.add_argument('--timeout', type=float, default=90.0)
    ap.add_argument('--max-hours', type=float, default=11.0)
    ap.add_argument('--marker', default='/tmp/tpu_ok')
    args = ap.parse_args()

    t0 = time.time()
    n = 0
    while time.time() - t0 < args.max_hours * 3600:
        n += 1
        plat = probe_once(args.timeout)
        stamp = time.strftime('%H:%M:%S')
        if plat and plat != 'cpu':
            print('%s probe %d: ALIVE platform=%s' % (stamp, n, plat),
                  flush=True)
            with open(args.marker, 'w') as f:
                f.write(plat + '\n')
            return 0
        print('%s probe %d: down (%s)' % (stamp, n, plat), flush=True)
        time.sleep(args.interval)
    print('gave up after %.1f h' % ((time.time() - t0) / 3600), flush=True)
    return 1


if __name__ == '__main__':
    sys.exit(main())
