"""REAL multi-process jax.distributed runs (CPU backend, N subprocesses).

The reference has no distributed backend at all (SURVEY.md §2.3); this is
the framework's own multi-host story, and these tests execute it with
actual separate processes — the TRACS_TPU_* env wiring, jax.distributed
initialisation, a mesh spanning processes, ``_put``'s
make_array_from_callback branch, cross-process ``to_host`` gathers, the
distance stage under SPMD, and pipe's cross-host ingest sharding +
``sync_global_devices`` barrier.  Outputs must be byte-identical to the
single-process run.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_workers(nproc, local_devices, argv, tmp_path):
    port = _free_port()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.update(
            TRACS_TPU_COORDINATOR=f"localhost:{port}",
            TRACS_TPU_NUM_PROCESSES=str(nproc),
            TRACS_TPU_PROCESS_ID=str(pid),
            LOCAL_DEVICES=str(local_devices),
            JAX_PLATFORMS="cpu",
        )
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, *argv],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=str(tmp_path),
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    return outs


def _write_msa(tmp_path, rng, n=13, L=401):
    from tracs_tpu.io.fasta import write_fasta

    chars = np.array(list("ACGTNRY"))
    msa = tmp_path / "mh.fasta"
    write_fasta(
        msa, [(f"s{i}", "".join(rng.choice(chars, size=L))) for i in range(n)]
    )
    return str(msa)


@pytest.mark.parametrize("nproc,local_devices", [(2, 2), (4, 1)])
def test_multiprocess_distance_matches_single(tmp_path, rng, nproc, local_devices):
    msa = _write_msa(tmp_path, rng)

    # single-process references, computed in THIS process (8-device conftest
    # mesh not used: plain single-device kernel)
    from tracs_tpu.ops.packing import pack_fasta
    from tracs_tpu.ops.pairsnp import snp_distance_dense
    from tracs_tpu.stages.distance import main as distance_main

    D_ref, NN_ref = snp_distance_dense(pack_fasta(msa))

    ref_csv = str(tmp_path / "ref.csv")
    argv_bak = sys.argv
    try:
        sys.argv = ["", "--msa", msa, "-o", ref_csv, "--mesh", "off",
                    "--row-block", "3"]
        distance_main()
    finally:
        sys.argv = argv_bak

    outdir = tmp_path / f"mh{nproc}"
    outdir.mkdir()
    _launch_workers(nproc, local_devices, ["distance", msa, str(outdir)], tmp_path)

    for pid in range(nproc):
        # dense ring result gathered identically on every process
        assert np.array_equal(np.load(outdir / f"D.{pid}.npy"), D_ref)
        assert np.array_equal(np.load(outdir / f"NN.{pid}.npy"), NN_ref)

    ref_bytes = open(ref_csv, "rb").read()
    # process 0 owns dist.csv; the others wrote dist.csv.proc<k>
    paths = [outdir / "dist.csv"] + [
        outdir / f"dist.csv.proc{k}" for k in range(1, nproc)
    ]
    for path in paths:
        assert open(path, "rb").read() == ref_bytes, path


def test_multiprocess_pipe_barrier_and_sharded_ingest(tmp_path, rng):
    """Full pipe under 2 processes: hosts ingest disjoint sample shards
    (i % process_count), meet at sync_global_devices, and process 0 runs
    the combine/distance/cluster tail over every host's align outputs."""
    outdir = tmp_path / "mh_pipe"
    outdir.mkdir()
    _launch_workers(2, 2, ["pipe", "unused", str(outdir)], tmp_path)

    dist_csv = outdir / "pipe_out" / "transmission_distances.csv"
    clus_csv = outdir / "pipe_out" / "transmission_clusters.csv"
    assert dist_csv.exists() and clus_csv.exists()

    # both hosts' samples are present: every pair of the 3 samples appears
    rows = [l.strip().split(",") for l in open(dist_csv).readlines()[1:]]
    by_pair = {
        frozenset((r[0].split("_")[0], r[1].split("_")[0])): r for r in rows
    }
    assert int(by_pair[frozenset(("close1", "close2"))][3]) == 2
    assert int(by_pair[frozenset(("close1", "far1"))][3]) == 62
    labels = {
        k.split("_")[0]: v
        for k, v in (l.strip().split(",") for l in open(clus_csv).readlines()[1:])
    }
    assert labels["close1"] == labels["close2"] != labels["far1"]
