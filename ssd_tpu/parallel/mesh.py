"""Device mesh and sharding rules for tensor parallelism.

The TPU-native replacement for the reference's NCCL TP process group
(/root/reference/ssd/engine/model_runner.py:98-107, linear.py:165-199,
embed_head.py:9-116): parameters get NamedShardings over a 1-D "tp" mesh axis
and XLA/GSPMD inserts the per-layer all-reduces (o_proj, down_proj) and the
LM-head vocab gather, overlapping them with compute via the latency-hiding
scheduler. The same jitted programs run unchanged at tp=1.

Sharding rules (matching the reference's column/row split):
 - wq/wk/wv: column-parallel on the head-output axis
 - wo:       row-parallel on the head-input axis
 - gate/up:  column-parallel on the FFN axis
 - down:     row-parallel on the FFN axis
 - embed / lm_head: vocab-parallel
 - KV cache: sharded on the kv-head axis alongside the attention heads
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, tp_size: int | None = None, dp_size: int = 1) -> Mesh:
    """1-D ("tp",) mesh, or 2-D ("dp", "tp") when dp_size > 1 (batch-sharded
    serving replicas sharing tp-sharded weights)."""
    devices = list(devices) if devices is not None else jax.devices()
    if tp_size is not None:
        devices = devices[: tp_size * dp_size]
    if dp_size > 1:
        assert len(devices) % dp_size == 0
        arr = np.asarray(devices).reshape(dp_size, len(devices) // dp_size)
        return Mesh(arr, axis_names=("dp", "tp"))
    return Mesh(np.asarray(devices), axis_names=("tp",))


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None):
    """Join a multi-host JAX runtime (DCN). The reference cannot scale past
    one node (config.py:55); here every host runs the same program and
    jax.devices() spans the whole slice afterwards."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_hybrid_mesh(tp_per_host: int | None = None,
                     num_hosts: int | None = None) -> Mesh:
    """Multi-host mesh with DCN as the outer ("dcn") axis and ICI as the
    inner ("tp") axis, so dense per-layer all-reduces ride ICI and only the
    hierarchical reduction step touches DCN. On a real TPU slice the layout
    comes from mesh_utils (ICI-topology aware); elsewhere — including
    single-process emulation of an n-host mesh on virtual devices — it is a
    host-major reshape of jax.devices(), which matches the multi-process
    global device order so the two produce bit-identical programs."""
    devices = jax.devices()
    if num_hosts is None:
        n_local = tp_per_host or jax.local_device_count()
        num_hosts = max(1, len(devices) // n_local)
    else:
        n_local = tp_per_host or (len(devices) // num_hosts)

    if jax.default_backend() == "tpu" and jax.process_count() > 1:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, n_local),
            dcn_mesh_shape=(num_hosts, 1),
        ).reshape(num_hosts, n_local)
    else:
        arr = np.asarray(devices[: num_hosts * n_local]).reshape(num_hosts, n_local)
    return Mesh(arr, axis_names=("dcn", "tp"))


_PARAM_SPECS = {
    "embed": P("tp", None),
    "embed_scale": P("tp"),
    "final_ln": P(None),
    "lm_head": P("tp", None),
    "lm_head_scale": P("tp"),
    # Reduced-draft-vocab map (loader.py / compute_logits): tiny, replicated.
    "d2t": P(None),
    "layers": {
        "input_ln": P(None, None),
        "wq": P(None, None, "tp"),
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"),
        "wo": P(None, "tp", None),
        "post_ln": P(None, None),
        "gate": P(None, None, "tp"),
        "up": P(None, None, "tp"),
        "down": P(None, "tp", None),
        "q_norm": P(None, None),
        "k_norm": P(None, None),
        # MoE (Qwen3-MoE): expert parallelism — the expert axis shards over
        # tp; the combine einsum contracts over E, so GSPMD inserts the
        # all-reduce there (one per layer, same count as dense TP).
        "router": P(None, None, None),
        "moe_gate": P(None, "tp", None, None),
        "moe_up": P(None, "tp", None, None),
        "moe_down": P(None, "tp", None, None),
        # int8 weight-only scales (utils/quant.py): shard like the weight's
        # out channels (the scale's last dim).
        "wq_scale": P(None, "tp"),
        "wk_scale": P(None, "tp"),
        "wv_scale": P(None, "tp"),
        "wo_scale": P(None, None),
        "gate_scale": P(None, "tp"),
        "up_scale": P(None, "tp"),
        "down_scale": P(None, None),
        "moe_gate_scale": P(None, "tp", None),
        "moe_up_scale": P(None, "tp", None),
        "moe_down_scale": P(None, "tp", None),
    },
}


# EAGLE-3 draft param dict (models/eagle3.py): flat, single layer. The TP
# conventions mirror the transformer's (column-parallel qkv/gate/up out dims,
# row-parallel wo/down in dims, vocab-parallel embed/head); fc's target-dim
# contraction is replicated (it runs once per token, tiny next to the layer).
_EAGLE_PARAM_SPECS = {
    "embed": P("tp", None),
    "fc": P(None, None),
    "input_ln": P(None),
    "cond_ln": P(None),
    "post_ln": P(None),
    "wq": P(None, "tp"),
    "wk": P(None, "tp"),
    "wv": P(None, "tp"),
    "wo": P("tp", None),
    "gate": P(None, "tp"),
    "up": P(None, "tp"),
    "down": P("tp", None),
    "final_ln": P(None),
    "lm_head": P("tp", None),
    "d2t": P(None),
    # int8 weight-only scales (utils/quant.py::quantize_eagle_params):
    # sharded like the weight's out channels.
    "embed_scale": P("tp"),
    "fc_scale": P(None),
    "wq_scale": P("tp"),
    "wk_scale": P("tp"),
    "wv_scale": P("tp"),
    "wo_scale": P(None),
    "gate_scale": P("tp"),
    "up_scale": P("tp"),
    "down_scale": P(None),
    "lm_head_scale": P("tp"),
}


def param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching a param pytree's structure."""
    if "layers" not in params:  # EAGLE-3 draft (flat single-layer dict)
        return {k: _EAGLE_PARAM_SPECS[k] for k in params}
    specs = {k: _PARAM_SPECS[k] for k in params if k != "layers"}
    specs["layers"] = {k: _PARAM_SPECS["layers"][k] for k in params["layers"]}
    return specs


def _axes_size(mesh: Mesh, name) -> int:
    names = name if isinstance(name, tuple) else (name,)
    size = 1
    for n in names:
        size *= mesh.shape[n]
    return size


def _compatible_spec(x, spec: P, mesh: Mesh) -> P:
    """Adapt a spec to the mesh: on a hybrid ("dcn", "tp") mesh the model axes
    shard over BOTH (so a 70B's memory scales across hosts); axes whose size
    the dimension doesn't divide fall back to "tp" alone, then to replication
    (e.g. tp > kv heads in GQA: replicate KV instead of sharding it)."""
    hybrid = "dcn" in mesh.axis_names
    axes = []
    for dim, name in zip(x.shape, spec):
        if name is None:
            axes.append(None)
            continue
        candidates = [("dcn", name), name] if (hybrid and name == "tp") else [name]
        chosen = None
        for cand in candidates:
            if dim % _axes_size(mesh, cand) == 0:
                chosen = cand
                break
        axes.append(chosen)
    return P(*axes)


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, spec: jax.device_put(
            x, NamedSharding(mesh, _compatible_spec(x, spec, mesh))
        ),
        params, specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def kv_sharding(mesh: Mesh, num_kv_heads: int | None = None) -> NamedSharding:
    """KV cache [L, H_kv, S, 2*hd] sharded over kv heads; falls back from
    ("dcn","tp") to "tp" to replication when the kv-head count doesn't
    divide."""
    if num_kv_heads is None:
        return NamedSharding(mesh, P(None, "tp", None, None))
    hybrid = "dcn" in mesh.axis_names
    for cand in ([("dcn", "tp")] if hybrid else []) + ["tp"]:
        if num_kv_heads % _axes_size(mesh, cand) == 0:
            return NamedSharding(mesh, P(None, cand, None, None))
    return NamedSharding(mesh, P(None))
