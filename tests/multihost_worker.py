"""SPMD worker for the real multi-process jax.distributed tests.

Launched by tests/test_multihost.py as N subprocesses wired together with
TRACS_TPU_COORDINATOR / TRACS_TPU_NUM_PROCESSES / TRACS_TPU_PROCESS_ID (the
exact production env contract, parallel/multihost.py) on the CPU backend
with a few forced local devices each.  Every process runs the same program:

1. ``initialize()``       — jax.distributed wiring (multihost.py:46-55)
2. ``resolve_mesh('global')`` — the sanctioned cross-host spec
3. ``sharded_snp_distance``   — the triangle ring over a mesh spanning
   processes; exercises ``_put``'s make_array_from_callback branch
   (allpairs.py) and the cross-process ``to_host`` gather
4. the distance STAGE on the global mesh (RingCoo stripes + streaming CSV)
5. optionally (MODE=pipe) the full pipe with a fake aligner: per-host
   sample sharding (``i % process_count``) and the cross-host
   ``sync_global_devices`` barrier (stages/pipe.py)

Each step writes artifacts into OUTDIR for the parent test to compare
against single-process references.
"""

import os
import sys

# launched with cwd=tmp_path, so the repo root is not on sys.path by default
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(os.environ.get("LOCAL_DEVICES", "2")))


def main():
    mode, msa, outdir = sys.argv[1], sys.argv[2], sys.argv[3]

    from tracs_tpu.parallel.multihost import initialize

    assert initialize() is True, "jax.distributed did not initialise"
    pid = jax.process_index()
    nproc = int(os.environ["TRACS_TPU_NUM_PROCESSES"])
    assert jax.process_count() == nproc

    if mode == "pipe":
        _run_pipe(outdir)
        print(f"worker {pid} OK", flush=True)
        return

    import numpy as np

    from tracs_tpu.ops.packing import pack_fasta
    from tracs_tpu.parallel.allpairs import sharded_snp_distance
    from tracs_tpu.parallel.mesh import resolve_mesh

    mesh = resolve_mesh("global")
    assert mesh is not None
    assert int(np.prod(list(mesh.shape.values()))) == len(jax.devices())

    D, NN = sharded_snp_distance(pack_fasta(msa), mesh)
    np.save(os.path.join(outdir, f"D.{pid}.npy"), D)
    np.save(os.path.join(outdir, f"NN.{pid}.npy"), NN)

    # the production stage on the same global mesh: streaming driver,
    # RingCoo stripes, native CSV writer.  Process 0 owns dist.csv; the
    # others write dist.csv.proc<k> (byte-identical by construction).
    import argparse

    from tracs_tpu.stages.distance import distance_parser

    parser = distance_parser(argparse.ArgumentParser())
    args = parser.parse_args([
        "--msa", msa, "-o", os.path.join(outdir, "dist.csv"),
        "--mesh", "global", "--row-block", "3",
    ])
    args.func(args)
    print(f"worker {pid} OK", flush=True)


def _run_pipe(outdir):
    """Full pipe under jax.distributed: the fake-aligner fixture from
    test_align_pipe generates the pileups, hosts shard the per-sample
    ingest, and process 0 runs the combine/distance/cluster tail after the
    cross-host barrier."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np
    from test_align_pipe import (
        fake_align_and_pileup_factory,
        make_db_zip,
        make_sample,
    )

    from tracs_tpu.io.fasta import write_fasta
    from tracs_tpu.stages import align as align_mod

    rng = np.random.default_rng(12345)
    ref_genome = "".join(rng.choice(list("ACGT"), size=3000))
    samples = {
        "close1": make_sample(ref_genome, [100, 200]),
        "close2": make_sample(ref_genome, [100, 250]),
        "far1": make_sample(ref_genome, list(range(500, 560))),
    }

    # deterministic inputs shared by all processes (same FS)
    ref_path = os.path.join(outdir, "REF1.fasta")
    db_path = os.path.join(outdir, "db.zip")
    input_tsv = os.path.join(outdir, "input.tsv")
    if jax.process_index() == 0:
        write_fasta(ref_path, [("chr1", ref_genome)])
        make_db_zip(db_path, ref_path, "REF1")
        import gzip

        with open(input_tsv, "w") as fh:
            fh.write("prefix\tr1\n")
            for name in sorted(samples):
                reads = os.path.join(outdir, f"{name}.fastq.gz")
                with open(reads, "wb") as rf:
                    rf.write(gzip.compress(b"@r\nA\n+\nF\n"))
                fh.write(f"{name}\t{reads}\n")
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("test_inputs_ready")

    align_mod.align_and_pileup = fake_align_and_pileup_factory(ref_genome, samples)
    align_mod.run_gather = lambda **kw: ["REF1"]

    from tracs_tpu.cli import main as cli_main

    cli_main([
        "pipe", "-i", input_tsv, "--database", db_path,
        "-o", os.path.join(outdir, "pipe_out"), "--min-cov", "2",
    ])


if __name__ == "__main__":
    main()
