"""Canonical CLI: run training/testing from a YAML config + CLI overrides.

Parity with /root/reference/audio_slowfast/tools/run_net.py:13-26 and the
reference ``launch_job`` wrapper (utils/misc.py:234-262) — on TPU there is no
process spawn: one controller drives the whole mesh.
"""

from asf_tpu.engine.test_loop import test
from asf_tpu.engine.train_loop import train
from asf_tpu.utils.parser import load_config, parse_args


def launch_job(cfg, init_method=None, func=None):
    """Single-controller equivalent of the reference launch_job."""
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
