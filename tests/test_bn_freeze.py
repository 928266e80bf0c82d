"""BN stats-freeze semantics (reference freeze_fn, audio_model_builder.py:327-344):
with BN.FREEZE, all BN running stats freeze during fine-tuning EXCEPT the
stem (s1) and the first fusion (s1_fuse)."""

import jax
import jax.numpy as jnp
import numpy as np

from fixtures import make_epic_fixture, tiny_cfg
from asf_tpu.models import build_model


def _stats_of(tree, prefix):
    out = {}

    def rec(node, path):
        if hasattr(node, "items"):
            for k, v in node.items():
                rec(v, path + (k,))
        else:
            out["/".join(path)] = np.asarray(node)

    rec(tree, ())
    return {k: v for k, v in out.items() if k.startswith(prefix)}


def test_bn_freeze_exempts_stem_and_s1_fuse(tmp_path):
    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = tiny_cfg(root)
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    t, f = cfg.AUDIO_DATA.NUM_FRAMES, cfg.AUDIO_DATA.NUM_FREQUENCIES
    fast = jnp.asarray(rng.standard_normal((2, t, f, 1)).astype(np.float32))
    slow = fast[:, :: cfg.SLOWFAST.ALPHA]
    variables = model.init(jax.random.PRNGKey(0), [slow, fast], train=False)

    _, mut = model.apply(
        variables,
        [slow, fast],
        train=True,
        bn_stats_frozen=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    before = _stats_of(variables["batch_stats"], "")
    after = _stats_of(mut["batch_stats"], "")

    changed = {k for k in before if not np.allclose(before[k], after[k])}
    frozen_prefixes = ("s2", "s3", "s4", "s5", "s2_fuse", "s3_fuse", "s4_fuse")
    # stem and s1_fuse must update
    assert any(k.startswith("s1/") for k in changed), sorted(changed)[:5]
    assert any(k.startswith("s1_fuse/") for k in changed)
    # everything else must be untouched
    leaked = {k for k in changed if k.startswith(frozen_prefixes)}
    assert not leaked, sorted(leaked)[:10]


def test_bn_unfrozen_updates_everything(tmp_path):
    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = tiny_cfg(root)
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    t, f = cfg.AUDIO_DATA.NUM_FRAMES, cfg.AUDIO_DATA.NUM_FREQUENCIES
    fast = jnp.asarray(rng.standard_normal((2, t, f, 1)).astype(np.float32))
    slow = fast[:, :: cfg.SLOWFAST.ALPHA]
    variables = model.init(jax.random.PRNGKey(0), [slow, fast], train=False)

    _, mut = model.apply(
        variables,
        [slow, fast],
        train=True,
        bn_stats_frozen=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    before = _stats_of(variables["batch_stats"], "")
    after = _stats_of(mut["batch_stats"], "")
    unchanged = [k for k in before if np.allclose(before[k], after[k])]
    assert not unchanged, unchanged[:10]
