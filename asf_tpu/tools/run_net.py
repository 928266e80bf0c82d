"""Canonical CLI: run training/testing from a YAML config + CLI overrides.

Parity with /root/reference/audio_slowfast/tools/run_net.py:13-26 and the
reference ``launch_job`` wrapper (utils/misc.py:234-262) — on TPU there is no
process spawn: one controller drives the whole mesh.
"""

import os  # noqa: F401  (kept for callers monkeypatching env)

from asf_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache

apply_platform_env()

enable_compilation_cache()

from asf_tpu.engine.test_loop import test  # noqa: E402
from asf_tpu.engine.train_loop import train  # noqa: E402
from asf_tpu.utils.parser import load_config, parse_args  # noqa: E402


def launch_job(cfg, init_method=None, func=None):
    """Single-controller equivalent of the reference launch_job
    (utils/misc.py:234-262): no per-device process spawn. Multi-host
    (NUM_SHARDS > 1) initialises the JAX distributed runtime — the
    counterpart of the reference's torch.distributed init_process_group —
    reusing the same --init_method tcp://host:port and SHARD_ID flags.
    """
    if cfg.NUM_SHARDS > 1:
        import jax

        # idempotent: main() calls launch_job once for train and once for
        # test in the SAME process (the reference spawns fresh processes per
        # job, torch.multiprocessing); a second initialize would raise.
        if not jax.distributed.is_initialized():
            coordinator = (init_method or "tcp://localhost:9999").replace("tcp://", "")
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=cfg.NUM_SHARDS,
                process_id=cfg.SHARD_ID,
            )
    return func(cfg)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args)

    if cfg.TRAIN.ENABLE:
        launch_job(cfg, args.init_method, train)

    if cfg.TEST.ENABLE:
        launch_job(cfg, args.init_method, test)


if __name__ == "__main__":
    main()
