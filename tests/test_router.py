"""Data-parallel serving router (runtime/router.py) on the CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu import ModelConfig
from quick_tpu.models import init_float_params
from quick_tpu.runtime.router import RouterEngine, replicated_engines
from quick_tpu.runtime.serving import Engine

TINY = ModelConfig(
    vocab_size=256, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def params():
    return init_float_params(TINY, jax.random.PRNGKey(0))


def _single_engine_reference(params, reqs):
    eng = Engine(params, TINY, max_slots=2, max_seq=64, page_size=4, chunk=8,
                 dtype=jnp.float32)
    uids = [eng.submit(p, max_new_tokens=g) for p, g in reqs]
    outs = eng.run()
    return [outs[u] for u in uids]


def test_router_matches_single_engine(params, cpu_mesh_devices):
    """Replica-routed greedy outputs == single-engine outputs, and the
    load spreads across replicas."""
    reqs = [(list(range(3 + i, 17 + i)), 4 + i % 3) for i in range(6)]
    ref = _single_engine_reference(params, reqs)

    router = replicated_engines(
        params, TINY, 3, devices=cpu_mesh_devices[:3],
        max_slots=2, max_seq=64, page_size=4, chunk=8, dtype=jnp.float32,
    )
    uids = [router.submit(p, max_new_tokens=g) for p, g in reqs]
    outs = router.run()
    assert [outs[u] for u in uids] == ref
    per_replica = [e.stats["admitted"] for e in router.engines]
    assert sum(per_replica) == len(reqs)
    assert max(per_replica) <= 3  # least-loaded routing spread the work


def test_router_least_loaded_routing(params, cpu_mesh_devices):
    """A big request must steer subsequent submissions to other replicas."""
    router = replicated_engines(
        params, TINY, 2, devices=cpu_mesh_devices[:2],
        max_slots=2, max_seq=64, page_size=4, chunk=8, dtype=jnp.float32,
    )
    router.submit(list(range(3, 33)), max_new_tokens=20)   # heavy -> r0
    router.submit(list(range(3, 9)), max_new_tokens=2)     # light -> r1
    router.submit(list(range(3, 9)), max_new_tokens=2)     # light -> r1
    loads = [len(e.queue) + sum(r is not None for r in e.slots)
             for e in router.engines]
    assert loads[1] >= 2  # both light requests landed on the idle replica
    router.run()


def test_router_streaming_and_request_access(params, cpu_mesh_devices):
    seen = []
    router = replicated_engines(
        params, TINY, 2, devices=cpu_mesh_devices[:2],
        max_slots=1, max_seq=64, page_size=4, chunk=8, dtype=jnp.float32,
    )
    uid = router.submit(
        list(range(5, 15)), max_new_tokens=4,
        on_token=lambda u, t: seen.append(t),
    )
    outs = router.run()
    assert outs[uid] == seen
    assert router.stats["admitted"] == 1
