"""2-process multi-host integration test (SURVEY.md §5.8; VERDICT round-1
item 6): launches two real JAX processes over the gloo CPU collectives
backend and runs the full trainer — sharded data loading, global-array batch
assembly, GAN train steps over a ('dcn','data') mesh, all-process validation,
and a coordinated Orbax checkpoint — asserting both ranks agree on the loss.

The heavy lifting happens in subprocesses (tests/mp_worker.py) because the
parent pytest process has already initialized a non-distributed JAX backend.
"""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / 'mp_worker.py'
REPO_ROOT = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def test_two_process_trainer(tmp_path):
    port = _free_port()
    nproc = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(nproc), str(port),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(REPO_ROOT),
            env={**os.environ, 'PYTHONPATH': str(REPO_ROOT)})
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f'worker {pid} failed (rc={p.returncode}):\n{out[-4000:]}')

    # both ranks computed the identical global loss
    losses = []
    for out in outs:
        m = re.search(r'MP_OK pid=\d+ total_loss=([\d.eE+-]+)', out)
        assert m, out[-2000:]
        losses.append(float(m.group(1)))
    assert losses[0] == pytest.approx(losses[1], abs=1e-6), losses

    # the coordinated checkpoint exists and validation wrote a sample GIF
    assert (tmp_path / 'ckpts' / 'checkpoint.final').exists()
    assert list((tmp_path / 'results').glob('*.gif'))
