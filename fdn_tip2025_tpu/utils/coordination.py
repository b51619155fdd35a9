"""Cross-job coordination: shared-accelerator validation mutex.

Parity: reference train_ir_gx.py:322-406 — two training jobs sharing GPUs
coordinate via a polled lock file + dist.barrier so only one runs
(memory-heavy) validation at a time. The TPU-native equivalent uses an
atomic lockfile (O_CREAT|O_EXCL) with stale-lock recovery; SPMD needs no
barrier since there is a single controller process per job.
"""

import os
import time


class FileLock:
    def __init__(self, path, stale_seconds=3600, poll=5.0):
        self.path = path
        self.stale = stale_seconds
        self.poll = poll

    def acquire(self, timeout=None):
        start = time.time()
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return True
            except FileExistsError:
                try:
                    if time.time() - os.path.getmtime(self.path) > \
                            self.stale:
                        os.unlink(self.path)  # stale owner
                        continue
                except FileNotFoundError:
                    continue
                if timeout is not None and time.time() - start > timeout:
                    return False
                time.sleep(self.poll)

    def release(self):
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass

    def __enter__(self):
        self.acquire()
        return self

    def __exit__(self, *exc):
        self.release()
