"""bench.py zoo-grant eviction: targeted pidfile teardown, never a pattern kill."""
import os
import subprocess
import sys
import textwrap
import time

import bench


def test_evict_ignores_missing_or_foreign_pidfile(tmp_path):
    assert bench._evict_known_zoo_run(str(tmp_path / "absent.pid")) is False
    # A live pid whose cmdline is NOT the zoo driver must never be signalled.
    own = tmp_path / "own.pid"
    own.write_text(str(os.getpid()))
    assert bench._evict_known_zoo_run(str(own)) is False


def test_evict_kills_the_whole_tree(tmp_path):
    fake = tmp_path / "reference_zoo.py"
    fake.write_text(textwrap.dedent("""
        import subprocess, sys, time
        child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(300)"])
        print(child.pid, flush=True)
        time.sleep(300)
    """))
    proc = subprocess.Popen([sys.executable, str(fake)], stdout=subprocess.PIPE, text=True)
    child_pid = int(proc.stdout.readline())
    pidfile = tmp_path / "zoo.pid"
    pidfile.write_text(str(proc.pid))

    assert bench._evict_known_zoo_run(str(pidfile)) is True
    proc.wait(timeout=30)
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            os.kill(child_pid, 0)
        except OSError:
            break
        time.sleep(0.2)
    else:
        raise AssertionError(f"child {child_pid} survived the tree eviction")
