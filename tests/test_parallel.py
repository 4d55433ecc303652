import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from knowledge_enhanced_multimodal_retrieval_tpu.parallel import (
    MeshRuntime,
    batch_sharding,
    host_local_batch_to_global,
    make_mesh,
    pad_to_multiple,
    shard_params,
)
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import MeshConfig


def test_make_mesh_all_devices(devices8):
    mesh = make_mesh(MeshConfig())
    assert mesh.shape == {"data": 8, "model": 1}


def test_make_mesh_2x4(devices8):
    mesh = make_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    assert mesh.shape == {"data": 2, "model": 4}


def test_mesh_runtime_shardings(devices8):
    rt = MeshRuntime.create()
    assert rt.num_data == 8
    s = rt.data_sharding(ndim=2)
    assert s.spec == P("data", None)


def test_batch_sharded_psum(devices8):
    """Batch-sharded arrays reduce correctly across the data axis under jit."""
    rt = MeshRuntime.create()
    x = np.arange(16, dtype=np.float32).reshape(16, 1)
    gx = host_local_batch_to_global(x, rt.mesh)
    assert gx.sharding.spec == P("data", None)
    total = jax.jit(lambda a: jnp.sum(a))(gx)
    assert float(total) == float(x.sum())


def test_shard_params_replicated(devices8):
    rt = MeshRuntime.create()
    params = {"w": np.ones((4, 4), np.float32), "b": np.zeros((4,), np.float32)}
    sharded = shard_params(params, rt.mesh)
    assert sharded["w"].sharding.is_fully_replicated


def test_pad_to_multiple():
    x = np.ones((13, 3))
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape == (16, 3)
    assert n == 13
    y, m = pad_to_multiple(np.ones((16, 3)), 8)
    assert y.shape == (16, 3) and m == 16


def test_sharded_matmul_matches_dense(devices8):
    """End-to-end: sharded batch x replicated weights == dense compute."""
    rt = MeshRuntime.create()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((32, 16)).astype(np.float32)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    gx = host_local_batch_to_global(x, rt.mesh)
    gw = shard_params(w, rt.mesh)
    out = jax.jit(lambda a, b: a @ b)(gx, gw)
    np.testing.assert_allclose(np.asarray(out), x @ w, rtol=1e-5, atol=1e-5)
