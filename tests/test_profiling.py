import time

from knowledge_enhanced_multimodal_retrieval_tpu.utils.profiling import StepTimer, annotate


def test_step_timer_stats():
    t = StepTimer(window=3)
    assert t.stats() == {}
    for _ in range(5):
        t.tick()
        time.sleep(0.01)
    stats = t.stats(batch_size=32)
    assert set(stats) == {"step_time_s", "steps_per_sec", "examples_per_sec"}
    assert stats["step_time_s"] > 0
    assert stats["examples_per_sec"] == 32 * stats["steps_per_sec"]
    assert len(t._times) == 3  # window respected


def test_annotate_context():
    import jax.numpy as jnp

    with annotate("region"):
        out = jnp.sum(jnp.ones((4,)))
    assert float(out) == 4.0
