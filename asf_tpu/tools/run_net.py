"""Canonical CLI: run training/testing from a YAML config + CLI overrides.

Parity with /root/reference/audio_slowfast/tools/run_net.py:13-26 and the
reference ``launch_job`` wrapper (utils/misc.py:234-262) — on TPU there is no
process spawn: one controller drives the whole mesh.
"""

import os


def _apply_platform_env():
    """Honour ASF_PLATFORM / ASF_CPU_DEVICES before any backend init.

    Site plugins may rewrite JAX_PLATFORMS at interpreter startup, so a
    plain env var cannot reliably select the CPU backend for debugging;
    these are read here, ahead of the first device query.
    """
    platform = os.environ.get("ASF_PLATFORM")
    n_cpu = os.environ.get("ASF_CPU_DEVICES")
    if n_cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_cpu}"
            ).strip()
        platform = platform or "cpu"
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


_apply_platform_env()

from asf_tpu.utils.jax_setup import enable_compilation_cache  # noqa: E402

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
