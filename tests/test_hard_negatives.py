"""Hard-negative mining + training (train/negatives.py, losses
neg_text_features, TrainConfig.hard_negatives; cli.mine_negatives).

No reference counterpart — the reference contrasts against in-batch random
negatives only (src/clip/train/losses.py:11-63).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.train.losses import (
    info_nce,
    joint_contrastive_loss,
    joint_sigmoid_loss,
    matryoshka_joint_loss,
)
from knowledge_enhanced_multimodal_retrieval_tpu.train.negatives import (
    load_negatives,
    mine_hard_negatives,
    save_negatives,
)
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import TrainConfig
from tests.test_trainer import MERGES, TINY


# -- mining -----------------------------------------------------------------


def test_mining_matches_bruteforce():
    rng = np.random.default_rng(0)
    n, d, k = 37, 8, 5
    q = rng.standard_normal((n, d)).astype(np.float32)
    t = rng.standard_normal((n, d)).astype(np.float32)
    idx = mine_hard_negatives(q, t, k, block=16)  # exercises padding too
    scores = q @ t.T
    np.fill_diagonal(scores, -np.inf)
    expect = np.argsort(-scores, axis=1)[:, :k]
    np.testing.assert_array_equal(idx, expect)
    assert idx.dtype == np.int32
    # self never appears
    assert not np.any(idx == np.arange(n)[:, None])


def test_mining_validates_args():
    a = np.zeros((4, 3), np.float32)
    with pytest.raises(ValueError, match="row-aligned"):
        mine_hard_negatives(a, np.zeros((5, 3), np.float32), 2)
    with pytest.raises(ValueError, match="k"):
        mine_hard_negatives(a, a, 4)


def test_save_load_roundtrip(tmp_path):
    idx = np.arange(12, dtype=np.int32).reshape(4, 3)
    uuids = [f"u{i}" for i in range(4)]
    p = str(tmp_path / "neg.npz")
    save_negatives(p, idx, uuids, meta={"by": "query"})
    idx2, uuids2 = load_negatives(p)
    np.testing.assert_array_equal(idx, idx2)
    assert uuids2 == uuids
    with pytest.raises(ValueError, match="aligned"):
        save_negatives(p, idx, uuids[:-1])


# -- loss extensions --------------------------------------------------------


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_info_nce_negatives_b_matches_manual():
    rng = np.random.default_rng(1)
    a = jnp.asarray(_norm(rng.standard_normal((6, 8))), jnp.float32)
    b = jnp.asarray(_norm(rng.standard_normal((6, 8))), jnp.float32)
    neg = jnp.asarray(_norm(rng.standard_normal((4, 8))), jnp.float32)
    t = 0.07
    loss, m = info_nce(a, b, temperature=t, negatives_b=neg)
    # manual: a->b direction gets 4 extra columns; b->a unchanged
    logits_ab = np.asarray(a) @ np.concatenate([np.asarray(b), np.asarray(neg)]).T / t
    logits_ba = np.asarray(b) @ np.asarray(a).T / t
    def ce(lg):
        lg = lg - lg.max(axis=1, keepdims=True)
        lp = lg - np.log(np.exp(lg).sum(axis=1, keepdims=True))
        return -np.mean(lp[np.arange(lg.shape[0]), np.arange(lg.shape[0])])
    expect = (ce(logits_ab) + ce(logits_ba)) / 2
    assert float(loss) == pytest.approx(expect, rel=1e-5)
    # hard negatives RAISE the loss vs none (more competition)
    loss0, _ = info_nce(a, b, temperature=t)
    assert float(loss) > float(loss0)


def test_info_nce_negatives_backcompat_unchanged():
    """No negatives -> numerics identical to the original two-branch form."""
    rng = np.random.default_rng(2)
    a = jnp.asarray(_norm(rng.standard_normal((5, 8))), jnp.float32)
    b = jnp.asarray(_norm(rng.standard_normal((5, 8))), jnp.float32)
    loss, m = info_nce(a, b, temperature=0.1)
    lg = np.asarray(a) @ np.asarray(b).T / 0.1
    lp = lg - lg.max(1, keepdims=True)
    lp = lp - np.log(np.exp(lp).sum(1, keepdims=True))
    l_ab = -np.mean(np.diag(lp))
    lgT = lg.T
    lpT = lgT - lgT.max(1, keepdims=True)
    lpT = lpT - np.log(np.exp(lpT).sum(1, keepdims=True))
    l_ba = -np.mean(np.diag(lpT))
    assert float(loss) == pytest.approx((l_ab + l_ba) / 2, rel=1e-5)


def test_global_negatives_sharded_matches_dense(devices8):
    """info_nce with mined negatives under shard_map+all_gather == the dense
    single-device computation on the concatenated batch."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    rng = np.random.default_rng(3)
    n, d, kneg = 16, 8, 6
    a = jnp.asarray(_norm(rng.standard_normal((n, d))), jnp.float32)
    b = jnp.asarray(_norm(rng.standard_normal((n, d))), jnp.float32)
    neg = jnp.asarray(_norm(rng.standard_normal((kneg * 8, d))), jnp.float32)

    dense, _ = info_nce(a, b, temperature=0.07, negatives_b=neg)

    mesh = Mesh(np.array(jax.devices()), ("data",))

    def local(a_, b_, n_):
        loss, _ = info_nce(a_, b_, temperature=0.07, axis_name="data", negatives_b=n_)
        return jax.lax.pmean(loss, "data")

    sharded = shard_map(
        local, mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
        out_specs=P(), check_vma=False,
    )
    assert float(sharded(a, b, neg)) == pytest.approx(float(dense), rel=1e-5)


def test_joint_losses_accept_negatives():
    rng = np.random.default_rng(4)
    img = jnp.asarray(_norm(rng.standard_normal((6, 8))), jnp.float32)
    q = jnp.asarray(_norm(rng.standard_normal((6, 8))), jnp.float32)
    t = jnp.asarray(_norm(rng.standard_normal((6, 8))), jnp.float32)
    neg = jnp.asarray(_norm(rng.standard_normal((5, 8))), jnp.float32)
    for fn in (joint_contrastive_loss, joint_sigmoid_loss):
        l0, _ = fn(img, q, t)
        l1, _ = fn(img, q, t, neg_text_features=neg)
        assert np.isfinite(float(l1)) and float(l1) > float(l0)
    # matryoshka wrapper prefix-normalizes the negatives too
    wrapped = matryoshka_joint_loss(joint_contrastive_loss, (4, 8))
    lm, m = wrapped(img, q, t, neg_text_features=neg)
    assert np.isfinite(float(lm)) and "loss_d4" in m


# -- pipeline + trainer integration ----------------------------------------


def _make_trainer(tmp_path, cfg_kwargs, n=32):
    from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
        DataPipeline,
        make_synthetic_source,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.train import trainer as T

    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(**{**TINY.__dict__, "vocab_size": tok.vocab_size})
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(n, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    cfg = TrainConfig(
        batch_size=16, epochs=1, lr=1e-3,
        checkpoint_dir=str(tmp_path / "ckpt"), **cfg_kwargs,
    )
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))
    return trainer, pipe


def _mined_table(pipe, m=4, seed=0):
    """A synthetic mined table + matching artifact for the pipeline."""
    rng = np.random.default_rng(seed)
    n = len(pipe)
    idx = np.stack([
        rng.permutation(np.delete(np.arange(n), i))[:m] for i in range(n)
    ]).astype(np.int32)
    uuids = [pipe.source[i]["uuid"] for i in range(n)]
    return idx, uuids


def test_negative_target_ids_tokens_match(devices8, tmp_path):
    _, pipe = _make_trainer(tmp_path, {})
    table, _ = _mined_table(pipe)
    out = pipe.negative_target_ids(np.array([3, 7, 1]), table, k=2)
    assert out.shape == (3, 2, 16)
    for bi, row in enumerate([3, 7, 1]):
        for kj in range(2):
            src_i = int(table[row, kj])
            direct = pipe.tokenizer(
                [pipe.source[src_i]["target_text"]], context_length=16
            )[0]
            np.testing.assert_array_equal(out[bi, kj], direct)


def test_train_step_with_negatives_descends(devices8, tmp_path):
    _, pipe = _make_trainer(tmp_path, {})
    table, uuids = _mined_table(pipe)
    path = str(tmp_path / "neg.npz")
    save_negatives(path, table, uuids)

    trainer, pipe = _make_trainer(
        tmp_path, {"hard_negatives": path, "hard_negatives_k": 3}
    )
    db = trainer._device_batch(pipe.make_batch(list(range(16))))
    assert db["neg_ids"].shape == (16, 3, 16)
    state, losses = trainer.state, []
    for _ in range(6):
        state, metrics = trainer.train_step(state, db)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses

    # negatives make the task strictly harder at identical params
    plain, _ = _make_trainer(tmp_path, {})
    db_plain = {k: v for k, v in db.items() if k != "neg_ids"}
    _, m_plain = plain.train_step(plain.state, db_plain)
    trainer2, _ = _make_trainer(tmp_path, {"hard_negatives": path, "hard_negatives_k": 3})
    _, m_neg = trainer2.train_step(trainer2.state, db)
    assert float(m_neg["loss"]) > float(m_plain["loss"])


def test_negatives_compose_with_gradcache_and_global(devices8, tmp_path):
    _, pipe = _make_trainer(tmp_path, {})
    table, uuids = _mined_table(pipe)
    path = str(tmp_path / "neg.npz")
    save_negatives(path, table, uuids)
    kw = {"hard_negatives": path, "hard_negatives_k": 2, "global_negatives": True}
    t_direct, pipe = _make_trainer(tmp_path, kw)
    t_cached, _ = _make_trainer(tmp_path, {**kw, "grad_cache_chunks": 2})
    db = t_direct._device_batch(pipe.make_batch(list(range(16))))
    _, m_d = t_direct.train_step(t_direct.state, db)
    _, m_c = t_cached.train_step(t_cached.state, db)
    assert float(m_c["loss"]) == pytest.approx(float(m_d["loss"]), rel=1e-5)


def test_table_guards(devices8, tmp_path):
    _, pipe = _make_trainer(tmp_path, {})
    table, uuids = _mined_table(pipe)
    path = str(tmp_path / "neg.npz")

    # wrong-size table refuses at trainer construction
    save_negatives(path, table[:10], uuids[:10])
    with pytest.raises(ValueError, match="re-mine"):
        _make_trainer(tmp_path, {"hard_negatives": path, "hard_negatives_k": 2})

    # k wider than the table refuses
    save_negatives(path, table, uuids)
    with pytest.raises(ValueError, match="exceeds"):
        _make_trainer(tmp_path, {"hard_negatives": path, "hard_negatives_k": 99})

    # shuffled uuids (table from a reordered dataset) refuse at batch build
    save_negatives(path, table, list(reversed(uuids)))
    trainer, pipe2 = _make_trainer(tmp_path, {"hard_negatives": path, "hard_negatives_k": 2})
    with pytest.raises(ValueError, match="different/reordered"):
        trainer._device_batch(pipe2.make_batch(list(range(16))))


def test_mine_negatives_cli_end_to_end(tmp_path, monkeypatch, devices8):
    """cli.mine_negatives on a synthetic split produces a consumable table."""
    from knowledge_enhanced_multimodal_retrieval_tpu.cli import mine_negatives as cli
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as MM

    monkeypatch.setitem(
        MM.ARCHS, "tiny", MM.CLIPArch(16, 32, 1, 32, 16, 16, 600, 32, 2, 1, vision_heads=2)
    )
    out = str(tmp_path / "neg.npz")
    path = cli.main([
        "--data.dataset=synthetic:24",
        "--data.image_size=32",
        "--data.context_length=16",
        "--model.name=tiny",
        "--eval.batch_size=8",
        "--out", out, "--k", "5", "--by", "query",
    ])
    idx, uuids = load_negatives(path)
    assert idx.shape == (24, 5) and len(uuids) == 24
    assert not np.any(idx == np.arange(24)[:, None])
