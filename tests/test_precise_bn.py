"""precise_bn (engine/train_loop.py): momentum-1 cumulative-average BN stat
recomputation (fvcore update_bn_stats parity, reference tools/train_net.py:
659-680), via the prefetched loader path with early-stop cleanup."""

import numpy as np
import jax
import pytest

import sys

sys.path.insert(0, "tests")

from test_multi_step import _make_batch, _tiny_cfg  # noqa: E402


class _Loader(list):
    batch_size = 4


def test_precise_bn_momentum1_average():
    from asf_tpu.engine.train_loop import make_precise_bn_step, precise_bn
    from asf_tpu.engine.steps import init_state
    from asf_tpu.models import build_model
    from asf_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg()
    cfg.TPU.DATA_PARALLEL = 2
    cfg.TPU.PREFETCH_DEPTH = 2
    rng = np.random.default_rng(5)
    batches = [_make_batch(rng, cfg, offset=i) for i in range(3)]

    class _Lazy:
        def init(self, params):
            import optax

            return optax.sgd(0.1).init(params)

    model = build_model(cfg)
    mesh = make_mesh(cfg)
    state = init_state(cfg, model, _Lazy(), jax.random.PRNGKey(0), batches[0])

    stats_step = make_precise_bn_step(cfg)
    # num_iters=2 < len(loader): exercises the early-break + prefetcher stop
    new_state = precise_bn(cfg, state, _Loader(batches), mesh, 2, stats_step=stats_step)

    # momentum-1: each batch's stats are the batch moments; the result is the
    # plain average of the two per-batch stat trees
    s0 = stats_step(state.params, state.batch_stats, jax.tree.map(np.asarray, batches[0]))
    s1 = stats_step(state.params, state.batch_stats, jax.tree.map(np.asarray, batches[1]))
    want = jax.tree.map(lambda a, b: (np.asarray(a) + np.asarray(b)) / 2, s0, s1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b, rtol=1e-4, atol=5e-6),
        new_state.batch_stats,
        want,
    )
    # and it actually changed something vs the init stats
    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        new_state.batch_stats,
        state.batch_stats,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-6


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
