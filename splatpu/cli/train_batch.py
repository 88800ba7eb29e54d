"""Multi-sequence batch training CLI (BASELINE config 5 orchestration).

The reference CLI trains one sequence per invocation (`train.py:809-847`);
this entry trains a BATCH of sequences, assigned in contiguous blocks to the
processes of a (multi-host) run via `splatpu.dist.multiseq`.  Single-process
invocations simply train every sequence serially — results are identical to
N independent `splatpu.cli.train` runs (tests/test_multiseq.py).

    python -m splatpu.cli.train_batch <data-directory-path>
        <total-iteration-count> <warmup-iteration-count> <learning-rate>
        <hidden-dimension> <residual-block-count>
        --sequences juggle basketball softball [-t N] [-o PATH]
        [--coordinator host:port --process-id K --num-processes P]
"""

from __future__ import annotations

import argparse
from pathlib import Path

from splatpu.cli.densify import add_binning_flags, binning_from_args
from splatpu.train.stage2 import Stage2Config


def main(argv=None):
    from splatpu.obs.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(prog="splatpu-train-batch")
    p.add_argument("data_directory_path", type=Path)
    p.add_argument("total_iteration_count", type=int)
    p.add_argument("warmup_iteration_count", type=int)
    p.add_argument("learning_rate", type=float)
    p.add_argument("hidden_dimension", type=int)
    p.add_argument("residual_block_count", type=int)
    p.add_argument("--sequences", nargs="+", required=True,
                   help="sequence names under data_directory_path")
    p.add_argument("-t", "--timestep-count-limit", type=int, default=None)
    p.add_argument("-o", "--output-directory-path", type=Path,
                   default=Path("./out"))
    p.add_argument("--renderer", default="auto")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--view-staging", default="device",
                   choices=["device", "device_u8", "host"])
    p.add_argument("--mesh-cameras", type=int, default=0,
                   help="per-sequence camera sharding over LOCAL devices")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="resume each local sequence from its checkpoint in "
                        "the output directory when present")
    # Multi-host wiring (jax.distributed): omit all three for single-process.
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (jax.distributed)")
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--num-processes", type=int, default=None)
    add_binning_flags(p)
    args = p.parse_args(argv)

    if args.coordinator is not None:
        from splatpu.dist.mesh import initialize_multihost

        initialize_multihost(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from splatpu.data.dataset import load_metadata, load_timestep_views
    from splatpu.dist.multiseq import SequenceJob, train_sequences
    from splatpu.io.checkpoint import load_cloud

    def make_job(name: str) -> SequenceJob:
        sequence_path = args.data_directory_path / name
        metadata = load_metadata(sequence_path)
        t_count = metadata.timestep_count
        if args.timestep_count_limit is not None:
            t_count = min(t_count, args.timestep_count_limit)
        config = Stage2Config(
            total_iterations=args.total_iteration_count,
            warmup_iterations=args.warmup_iteration_count,
            learning_rate=args.learning_rate,
            hidden_dim=args.hidden_dimension,
            residual_blocks=args.residual_block_count,
            timestep_count=t_count,
            renderer=args.renderer,
            binning_overrides=binning_from_args(args),
            seed=args.seed,
            view_staging=args.view_staging,
            mesh_cameras=args.mesh_cameras,
            checkpoint_every=args.checkpoint_every,
        )
        return SequenceJob(
            name=name,
            # Lazy: a sequence assigned to another process costs no IO here.
            initial_cloud=lambda sp=sequence_path: load_cloud(
                sp / "densified_initial_gaussian_cloud_parameters.npz"
            ),
            views_by_timestep=lambda sp=sequence_path, md=metadata, tc=t_count: [
                load_timestep_views(md, t, sp) for t in range(1, tc + 1)
            ],
            config=config,
        )

    jobs = [make_job(n) for n in args.sequences]
    results = train_sequences(
        jobs,
        out_dir=args.output_directory_path,
        progress=True,
        resume=args.resume,
    )
    print(f"trained {len(results)}/{len(jobs)} sequences in this process: "
          f"{sorted(results)}")


if __name__ == "__main__":
    main()
