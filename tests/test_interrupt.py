"""Hard-kill resume: SIGKILL a streaming distance run mid-sweep, resume
with --resume, and require the final CSV byte-identical to an
uninterrupted run.  The reference's interrupt contract is cooperative
SIGINT polling (pairsnp.hpp:384-388); ours is stronger — the cursor
snapshots the flushed byte offset per block, so a kill at ANY instruction
(mid-line write, between flush and cursor update) resumes cleanly.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from tracs_tpu.io.fasta import write_fasta


def _make_msa(tmp_path, rng, n=400, L=4000):
    chars = np.array(list("ACGTN"))
    msa = tmp_path / "kill.fasta"
    write_fasta(
        msa, [(f"s{i}", "".join(rng.choice(chars, size=L))) for i in range(n)]
    )
    return str(msa)


def _cmd(msa, out):
    return [
        sys.executable, "-m", "tracs_tpu", "distance",
        "--msa", msa, "-o", out, "--row-block", "8", "-D", "1000000",
        "--mesh", "off",
    ]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_sigkill_mid_sweep_resume_byte_identical(tmp_path, rng):
    msa = _make_msa(tmp_path, rng)

    ref = str(tmp_path / "ref.csv")
    subprocess.run(_cmd(msa, ref), env=_env(), check=True, timeout=600,
                   capture_output=True)
    ref_bytes = open(ref, "rb").read()
    assert ref_bytes.count(b"\n") > 10_000  # real workload, many blocks

    out = str(tmp_path / "killed.csv")
    cursor = out + ".cursor"
    errlog = open(tmp_path / "killed.stderr", "wb")
    proc = subprocess.Popen(_cmd(msa, out), env=_env(),
                            stdout=subprocess.DEVNULL, stderr=errlog)
    # wait until the sweep is demonstrably mid-matrix, then kill -9 with no
    # grace whatsoever
    killed_mid_run = False
    deadline = time.time() + 500
    while time.time() < deadline and proc.poll() is None:
        if os.path.exists(cursor):
            try:
                state = json.load(open(cursor))
            except (json.JSONDecodeError, OSError):
                continue  # racing the atomic replace
            if 50 <= state["next_row"] < 380:
                proc.send_signal(signal.SIGKILL)
                killed_mid_run = True
                break
        time.sleep(0.01)
    proc.wait(timeout=60)
    errlog.close()
    if not killed_mid_run and proc.returncode == 0:
        pytest.skip("run finished before the kill window — machine too fast")
    assert killed_mid_run, (
        "never saw a mid-matrix cursor; subprocess stderr:\n"
        + open(tmp_path / "killed.stderr").read()[-3000:]
    )
    assert proc.returncode != 0

    # the kill left a cursor and (possibly) a partial tail line
    assert os.path.exists(cursor)
    partial = open(out, "rb").read()
    assert 0 < len(partial) < len(ref_bytes)

    subprocess.run(_cmd(msa, out) + ["--resume"], env=_env(), check=True,
                   timeout=600, capture_output=True)
    assert open(out, "rb").read() == ref_bytes
    assert not os.path.exists(cursor)  # cleaned up on success
