"""Fork-style CLI: ``python main.py --config cfg.yaml --train/--test``.

Parity with /root/reference/main.py:81-175: merge YAML onto defaults, run
``prepare_dataset`` unless SKIP_PREPARATION, then train followed by a fresh
test pass (or test only).
"""

import argparse
import os

from asf_tpu.config import get_cfg
from asf_tpu.engine import test, train
from asf_tpu.state.dataset_prep import prepare_dataset
from asf_tpu.tools.run_net import launch_job
from asf_tpu.utils.logging import get_logger, setup_logging

logger = get_logger(__name__)


def parse_args():
    p = argparse.ArgumentParser(description="AudioSlowFast (TPU)")
    p.add_argument("--config", type=str, required=True, help="Path to the config YAML")
    p.add_argument("--train", action="store_true", help="Run training (then testing)")
    p.add_argument("--test", action="store_true", help="Run testing only")
    return vars(p.parse_args())


def main(args):
    cfg = get_cfg()
    cfg.merge_from_file(args["config"])
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    setup_logging(cfg.OUTPUT_DIR)

    if args["train"]:
        if not cfg.EPICKITCHENS.SKIP_PREPARATION:
            prepare_dataset(cfg=cfg)
        else:
            # Same path the dataset will use (epickitchens.py joins the
            # processed list names with ANNOTATIONS_DIR).
            for name in (
                cfg.EPICKITCHENS.PROCESSED_TRAIN_LIST,
                cfg.EPICKITCHENS.PROCESSED_VAL_LIST,
            ):
                path = os.path.join(cfg.EPICKITCHENS.ANNOTATIONS_DIR, name)
                if not os.path.exists(path):
                    logger.error("Processed list %s does not exist", path)
                    raise SystemExit(1)

        launch_job(cfg=cfg, init_method=None, func=train)

        # fresh cfg for the test pass (reference main.py:122-127)
        cfg = get_cfg()
        cfg.merge_from_file(args["config"])
        launch_job(cfg=cfg, init_method=None, func=test)

    elif args["test"]:
        launch_job(cfg=cfg, init_method=None, func=test)

    else:
        logger.error("Nothing to do: pass --train or --test")


if __name__ == "__main__":
    main(parse_args())
