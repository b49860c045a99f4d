"""Multi-host (multi-process) validation: the decode step runs as a
multi-controller SPMD program over a global ("dcn", "tp") mesh spanning two
processes — the topology the 70B target uses across hosts (SURVEY §7.2 step
8; the reference is hard-capped to one node, config.py:55).

Each worker initialises jax.distributed (Gloo over localhost), shards the
parameters over the global tp axis, runs one paged decode step, and prints
the sampled tokens; they must match a single-process run bit-for-bit."""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    mode, port, local_devices = sys.argv[1], sys.argv[2], sys.argv[3]
    pid = int(sys.argv[4])
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    if mode == "dist":
        jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                                   num_processes=2, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ssd_tpu.config import ModelConfig
    from ssd_tpu.engine.model_runner import decode_step
    from ssd_tpu.models.transformer import Arch, init_params
    from ssd_tpu.parallel.mesh import shard_params

    mc = ModelConfig(model_type="llama", vocab_size=256, hidden_size=64,
                     intermediate_size=128, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2,
                     max_position_embeddings=256, rope_theta=10000.0)
    arch = Arch.from_model_config(mc)
    assert jax.device_count() == 4, jax.device_count()
    # Global mesh: hosts on the outer dcn axis, tp within each host; params
    # shard over tp (per ssd_tpu.parallel.mesh specs), replicate over dcn.
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2), ("dcn", "tp"))
    params = shard_params(init_params(arch, jax.random.PRNGKey(0), jnp.float32), mesh)
    rep = NamedSharding(mesh, P())
    kv = jnp.zeros((2, 2, 512, 32), jnp.float32, device=rep)
    put = lambda x: jax.device_put(jnp.asarray(x), rep)
    tokens, logits, _, kv = decode_step(
        params, kv,
        put(np.array([7, 9], np.int32)), put(np.array([3, 3], np.int32)),
        put(np.array([3, 16 + 3], np.int32)),
        put(np.pad(np.array([[0], [1]], np.int32), ((0, 0), (0, 7)),
                   constant_values=-1)),
        put(np.array([4, 4], np.int32)), put(np.zeros(2, np.float32)),
        jax.random.PRNGKey(1),
        arch=arch, block_size=16, ctx_pad=64, q_len=1,
    )
    print("TOKENS", list(np.asarray(tokens)), flush=True)
""")


def _tokens_line(text: str) -> str:
    return [l for l in text.splitlines() if l.startswith("TOKENS")][0]


@pytest.mark.skipif(os.environ.get("SSD_SKIP_MULTIHOST") == "1",
                    reason="multihost disabled")
def test_two_process_dcn_tp_decode_matches_single_process():
    port = str(29500 + os.getpid() % 500)

    ref = subprocess.run(
        [sys.executable, "-c", WORKER, "single", port, "4", "0"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert ref.returncode == 0, ref.stdout + ref.stderr
    want = _tokens_line(ref.stdout)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, "dist", port, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, out[-2000:]
        outs.append(out)
    got = _tokens_line(outs[0])
    assert got == want, f"{got} != {want}"


# --- full engine loop over two processes (VERDICT r1 item 4) ---------------

WORKER_GEN = textwrap.dedent("""
    import os, sys
    mode, port, local_devices, pid, model_dir = sys.argv[1:6]
    draft_dir = sys.argv[6] if len(sys.argv) > 6 else None
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    from ssd_tpu.llm import LLM
    from ssd_tpu.sampling_params import SamplingParams

    kw = dict(init_random=False, dtype="float32", max_model_len=128,
              max_num_seqs=2, kvcache_block_size=16, num_kvcache_blocks=32,
              num_hosts=2)
    if draft_dir and os.environ.get("SSD_MH_MODE") == "eagle":
        # EAGLE async SSD: the conditioning activations come out of the
        # global verify fully replicated, so every host's draft replica
        # conditions identically and the replication symmetry holds.
        kw.update(draft=draft_dir, speculate=True, speculate_k=2,
                  draft_async=True, async_fan_out=2, use_eagle=True,
                  jit_speculate=True, eagle_layers=[0, 1, 1])
    elif draft_dir and os.environ.get("SSD_MH_MODE") == "ssd_dp":
        # draft_dp x multi-host (round 4): the global replica set shards
        # over hosts (seq_id % draft_dp routing); per-host partial replies
        # union via one psum over the dcn axis.
        kw.update(draft=draft_dir, speculate=True, speculate_k=2,
                  draft_async=True, async_fan_out=2, draft_dp=2)
    elif draft_dir and os.environ.get("SSD_MH_MODE") == "ssd":
        # Async SSD: per-host replicated draft server (identical inputs +
        # seeds => identical speculations on every host), global verify.
        kw.update(draft=draft_dir, speculate=True, speculate_k=2,
                  draft_async=True, async_fan_out=2)
    elif draft_dir:
        # Fused multi-round sync SD over the global mesh: one packed upload
        # per superstep; target AND draft params are global arrays.
        kw.update(draft=draft_dir, speculate=True, speculate_k=2,
                  spec_rounds=2)
    if mode == "dist":
        # The ENGINE joins the distributed runtime (Config wiring under test).
        kw.update(coordinator_address=f"localhost:{port}", host_id=int(pid))
    eng = LLM(model_dir, **kw)
    prompts = [[1, 5, 9, 2, 7], [4, 4, 8], [3, 1, 2, 6, 6, 6, 1], [9, 9]]
    outs, _ = eng.generate(
        prompts,
        SamplingParams(temperature=0.0, max_new_tokens=12, ignore_eos=True),
        use_tqdm=False,
    )
    print("GEN", [o["token_ids"] for o in outs], flush=True)
""")


def _gen_line(text: str) -> str:
    return [l for l in text.splitlines() if l.startswith("GEN")][0]


@pytest.mark.skipif(os.environ.get("SSD_SKIP_MULTIHOST") == "1",
                    reason="multihost disabled")
def test_two_process_generate_matches_single_process(tmp_path):
    """Continuous batching (max_num_seqs=2 over 4 prompts: prefill waves +
    decode) through LLM(num_hosts=2): two engine controllers over a global
    (dcn=2, tp=2) mesh must produce the same tokens as one controller
    emulating the same mesh on 4 local devices."""
    from tests.utils_models import make_tiny_llama

    model_dir = str(tmp_path / "m")
    make_tiny_llama(model_dir, seed=11)
    port = str(29500 + (os.getpid() + 101) % 500)

    ref = subprocess.run(
        [sys.executable, "-c", WORKER_GEN, "single", port, "4", "0", model_dir],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert ref.returncode == 0, ref.stdout + ref.stderr
    want = _gen_line(ref.stdout)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER_GEN, "dist", port, "2", str(i),
             model_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out[-2000:]
        outs.append(out)
    for out in outs:
        got = _gen_line(out)
        assert got == want, f"{got} != {want}"


@pytest.mark.skipif(os.environ.get("SSD_SKIP_MULTIHOST") == "1",
                    reason="multihost disabled")
def test_two_process_generate_fused_sd_matches_single_process(tmp_path):
    """Fused multi-round sync SD through LLM(num_hosts=2): the superstep's
    packed payload travels the global-upload path and both models' params
    live on the global mesh — two controllers must match one controller
    token-for-token (the code-review finding was that fused SD bypassed the
    multi-host upload discipline entirely)."""
    from tests.utils_models import make_tiny_llama

    model_dir = str(tmp_path / "t")
    draft_dir = str(tmp_path / "d")
    make_tiny_llama(model_dir, seed=11)
    make_tiny_llama(draft_dir, layers=1, hidden=32, intermediate=64, seed=5)
    port = str(29500 + (os.getpid() + 207) % 500)

    ref = subprocess.run(
        [sys.executable, "-c", WORKER_GEN, "single", port, "4", "0",
         model_dir, draft_dir],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert ref.returncode == 0, ref.stdout + ref.stderr
    want = _gen_line(ref.stdout)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER_GEN, "dist", port, "2", str(i),
             model_dir, draft_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out[-2000:]
        outs.append(out)
    for out in outs:
        got = _gen_line(out)
        assert got == want, f"{got} != {want}"


@pytest.mark.skipif(os.environ.get("SSD_SKIP_MULTIHOST") == "1",
                    reason="multihost disabled")
def test_two_process_generate_async_ssd_matches_single_process(tmp_path):
    """Async SSD (the flagship mode) through LLM(num_hosts=2): every host
    runs its own deterministic draft-server replica on a local device; the
    verify consumes globally-uploaded speculations and host-hopped logits.
    Two controllers must match one controller token-for-token."""
    import os as _os

    from tests.utils_models import make_tiny_llama

    model_dir = str(tmp_path / "t")
    draft_dir = str(tmp_path / "d")
    make_tiny_llama(model_dir, seed=11)
    make_tiny_llama(draft_dir, layers=1, hidden=32, intermediate=64, seed=5)
    port = str(29500 + (_os.getpid() + 311) % 500)
    env = {**_os.environ, "SSD_MH_MODE": "ssd"}

    ref = subprocess.run(
        [sys.executable, "-c", WORKER_GEN, "single", port, "4", "0",
         model_dir, draft_dir],
        capture_output=True, text=True, timeout=300, cwd="/root/repo", env=env,
    )
    assert ref.returncode == 0, ref.stdout + ref.stderr
    want = _gen_line(ref.stdout)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER_GEN, "dist", port, "2", str(i),
             model_dir, draft_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo", env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out[-2000:]
        outs.append(out)
    for out in outs:
        got = _gen_line(out)
        assert got == want, f"{got} != {want}"


@pytest.mark.skipif(os.environ.get("SSD_SKIP_MULTIHOST") == "1",
                    reason="multihost disabled")
def test_two_process_generate_eagle_matches_single_process(tmp_path):
    """EAGLE async SSD through LLM(num_hosts=2): the carve-out lifted — the
    conditioning activations are fully-replicated global-verify outputs, so
    per-host draft replicas stay in lockstep. Two controllers must match one
    controller token-for-token."""
    import os as _os

    from tests.utils_models import make_tiny_eagle, make_tiny_llama

    model_dir = str(tmp_path / "t")
    draft_dir = str(tmp_path / "e")
    make_tiny_llama(model_dir, seed=11)
    make_tiny_eagle(draft_dir, seed=5)
    port = str(29500 + (_os.getpid() + 421) % 500)
    env = {**_os.environ, "SSD_MH_MODE": "eagle"}

    ref = subprocess.run(
        [sys.executable, "-c", WORKER_GEN, "single", port, "4", "0",
         model_dir, draft_dir],
        capture_output=True, text=True, timeout=300, cwd="/root/repo", env=env,
    )
    assert ref.returncode == 0, ref.stdout + ref.stderr
    want = _gen_line(ref.stdout)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER_GEN, "dist", port, "2", str(i),
             model_dir, draft_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo", env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out[-2000:]
        outs.append(out)
    for out in outs:
        got = _gen_line(out)
        assert got == want, f"{got} != {want}"


@pytest.mark.skipif(os.environ.get("SSD_SKIP_MULTIHOST") == "1",
                    reason="multihost disabled")
def test_two_process_generate_draft_dp_matches_single_process(tmp_path):
    """draft_dp=2 x num_hosts=2 (the last lift-able carve-out): each host
    runs ONE of the two global draft replicas (seq_id % 2 routing) and the
    partial replies union via a psum over the dcn axis. Two controllers must
    match a SINGLE controller running both replicas locally,
    token-for-token (greedy — the warmup ghost-call sequences differ per
    topology, which only perturbs sampling seeds)."""
    import os as _os

    from tests.utils_models import make_tiny_llama

    model_dir = str(tmp_path / "t")
    draft_dir = str(tmp_path / "d")
    make_tiny_llama(model_dir, seed=11)
    make_tiny_llama(draft_dir, layers=1, hidden=32, intermediate=64, seed=5)
    port = str(29500 + (_os.getpid() + 533) % 500)
    env = {**_os.environ, "SSD_MH_MODE": "ssd_dp"}

    ref = subprocess.run(
        [sys.executable, "-c", WORKER_GEN, "single", port, "4", "0",
         model_dir, draft_dir],
        capture_output=True, text=True, timeout=300, cwd="/root/repo", env=env,
    )
    assert ref.returncode == 0, ref.stdout + ref.stderr
    want = _gen_line(ref.stdout)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER_GEN, "dist", port, "2", str(i),
             model_dir, draft_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo", env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out[-2000:]
        outs.append(out)
    for out in outs:
        got = _gen_line(out)
        assert got == want, f"{got} != {want}"


def test_70b_geometry_sharded_step_compiles():
    """BASELINE config #5 readiness: the decode step LOWERS AND COMPILES at
    the real Llama-70B per-layer geometry (hidden 8192, 64 q / 8 kv heads,
    inter 28672, vocab 128256; scan length shrunk to 2 — layer count only
    changes the scan trip count) over a hybrid (dcn=2, tp=4) mesh with the
    engine's own param/KV shardings, using shape-only abstract params so no
    70B weights are materialized. Validates the GSPMD partitioning rules
    (incl. the GQA kv-head fallback: 8 kv heads over the (dcn,tp)=8 axes)
    at scale on 8 virtual CPU devices."""
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ssd_tpu.config import ModelConfig
    from ssd_tpu.engine.model_runner import decode_step
    from ssd_tpu.models.transformer import Arch, init_params
    from ssd_tpu.parallel import mesh as pmesh

    mc = ModelConfig(
        model_type="llama", vocab_size=128256, hidden_size=8192,
        intermediate_size=28672, num_hidden_layers=2,
        num_attention_heads=64, num_key_value_heads=8,
        max_position_embeddings=8192, rope_theta=500000.0,
    )
    arch = Arch.from_model_config(mc)
    m = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dcn", "tp"))

    abstract = jax.eval_shape(
        lambda k: init_params(arch, k, jnp.bfloat16), jax.random.PRNGKey(0))
    specs = pmesh.param_specs(abstract)
    params = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(
            x.shape, x.dtype,
            sharding=NamedSharding(m, pmesh._compatible_spec(x, s, m))),
        abstract, specs, is_leaf=lambda x: not isinstance(x, dict))

    block_size, num_blocks, B, M = 64, 16, 2, 8
    kv = jax.ShapeDtypeStruct(
        (arch.num_layers, arch.num_kv_heads, num_blocks * block_size,
         2 * arch.head_dim), jnp.bfloat16,
        sharding=pmesh.kv_sharding(m, arch.num_kv_heads))
    rep = NamedSharding(m, P())
    i32 = lambda *shape: jax.ShapeDtypeStruct(shape, jnp.int32, sharding=rep)
    f32 = lambda *shape: jax.ShapeDtypeStruct(shape, jnp.float32, sharding=rep)

    lowered = decode_step.lower(
        params, kv, i32(B), i32(B), i32(B), i32(B, M), i32(B), f32(B),
        jax.random.PRNGKey(1),
        arch=arch, block_size=block_size, ctx_pad=256, q_len=1,
    )
    compiled = lowered.compile()  # SPMD partitioner runs here
    assert compiled is not None


def test_70b_geometry_fused_eagle_superstep_compiles():
    """The round-4 flagship at scale: eagle_sd_superstep LOWERS AND COMPILES
    at the Llama-70B per-layer geometry over a hybrid (dcn=2, tp=4) mesh,
    with the engine's own param shardings for BOTH the target pytree and the
    EAGLE draft dict (parallel/mesh.py eagle specs), shape-only abstract
    params throughout."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ssd_tpu.config import ModelConfig
    from ssd_tpu.engine.fused_sd import eagle_sd_superstep
    from ssd_tpu.models.eagle3 import EagleArch, init_eagle_params
    from ssd_tpu.models.transformer import Arch, init_params
    from ssd_tpu.parallel import mesh as pmesh

    mc = ModelConfig(
        model_type="llama", vocab_size=128256, hidden_size=8192,
        intermediate_size=28672, num_hidden_layers=2,
        num_attention_heads=64, num_key_value_heads=8,
        max_position_embeddings=8192, rope_theta=500000.0,
    )
    t_arch = Arch.from_model_config(mc)
    d_arch = EagleArch.from_model_config(mc, d_model_target=8192,
                                         num_eagle_layers=3)
    m = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dcn", "tp"))

    def sharded_abstract(init):
        abstract = jax.eval_shape(init, jax.random.PRNGKey(0))
        specs = pmesh.param_specs(abstract)
        return jax.tree.map(
            lambda x, s: jax.ShapeDtypeStruct(
                x.shape, x.dtype,
                sharding=NamedSharding(m, pmesh._compatible_spec(x, s, m))),
            abstract, specs, is_leaf=lambda x: not isinstance(x, dict))

    t_params = sharded_abstract(lambda k: init_params(t_arch, k, jnp.bfloat16))
    d_params = sharded_abstract(
        lambda k: init_eagle_params(d_arch, k, jnp.bfloat16))

    block_size, num_blocks, B, M, K, R = 64, 16, 2, 8, 3, 2
    tkv = jax.ShapeDtypeStruct(
        (t_arch.num_layers, t_arch.num_kv_heads, num_blocks * block_size,
         2 * t_arch.head_dim), jnp.bfloat16,
        sharding=pmesh.kv_sharding(m, t_arch.num_kv_heads))
    dkv = jax.ShapeDtypeStruct(
        (1, d_arch.num_kv_heads, num_blocks * block_size,
         2 * d_arch.head_dim), jnp.bfloat16,
        sharding=pmesh.kv_sharding(m, d_arch.num_kv_heads))
    rep = NamedSharding(m, P())
    i32 = lambda *shape: jax.ShapeDtypeStruct(shape, jnp.int32, sharding=rep)
    f32 = lambda *shape: jax.ShapeDtypeStruct(shape, jnp.float32, sharding=rep)

    lowered = eagle_sd_superstep.lower(
        t_params, tkv, d_params, dkv,
        i32(B), f32(B, 3 * 8192), i32(B), i32(B, M), i32(B, M),
        f32(B), f32(B), jax.random.PRNGKey(1),
        t_arch=t_arch, d_arch=d_arch, block_size=block_size,
        ctx_pad_t=256, ctx_pad_d=256, K=K, R=R, eagle_layers=(0, 1, 1),
    )
    compiled = lowered.compile()  # SPMD partitioner runs here
    assert compiled is not None


def test_70b_geometry_fused_async_superstep_compiles():
    """The round-5 flagship at scale: async_ssd_superstep (tree build +
    verify + in-program cache service, R rounds) LOWERS AND COMPILES at the
    Llama-70B target geometry with a 1B-geometry draft over a hybrid
    (dcn=2, tp=4) mesh, engine param shardings on both pytrees, shape-only
    abstract params throughout (BASELINE config #5 readiness for the new
    mode)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ssd_tpu.config import ModelConfig
    from ssd_tpu.engine.async_fused import async_ssd_superstep
    from ssd_tpu.models.transformer import Arch, init_params
    from ssd_tpu.parallel import mesh as pmesh

    t_arch = Arch.from_model_config(ModelConfig(
        model_type="llama", vocab_size=128256, hidden_size=8192,
        intermediate_size=28672, num_hidden_layers=2,
        num_attention_heads=64, num_key_value_heads=8,
        max_position_embeddings=8192, rope_theta=500000.0,
    ))
    d_arch = Arch.from_model_config(ModelConfig(
        model_type="llama", vocab_size=128256, hidden_size=2048,
        intermediate_size=8192, num_hidden_layers=2,
        num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=8192, rope_theta=500000.0,
    ))
    m = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dcn", "tp"))

    def sharded_abstract(arch):
        abstract = jax.eval_shape(
            lambda k: init_params(arch, k, jnp.bfloat16),
            jax.random.PRNGKey(0))
        specs = pmesh.param_specs(abstract)
        return jax.tree.map(
            lambda x, s: jax.ShapeDtypeStruct(
                x.shape, x.dtype,
                sharding=NamedSharding(m, pmesh._compatible_spec(x, s, m))),
            abstract, specs, is_leaf=lambda x: not isinstance(x, dict))

    def kv_abstract(arch, num_blocks, block_size):
        return jax.ShapeDtypeStruct(
            (arch.num_layers, arch.num_kv_heads, num_blocks * block_size,
             2 * arch.head_dim), jnp.bfloat16,
            sharding=pmesh.kv_sharding(m, arch.num_kv_heads))

    block_size, B, M = 64, 2, 8
    K, F = 2, 2
    fan = (F,) * (K + 1)
    rep = NamedSharding(m, P())
    i32 = lambda *s: jax.ShapeDtypeStruct(s, jnp.int32, sharding=rep)
    f32 = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32, sharding=rep)

    lowered = async_ssd_superstep.lower(
        sharded_abstract(t_arch), kv_abstract(t_arch, 16, block_size),
        sharded_abstract(d_arch), kv_abstract(d_arch, 16, block_size),
        i32(B), i32(B), i32(B, M), i32(B, M), f32(B), f32(B),
        jax.random.PRNGKey(1),
        t_arch=t_arch, d_arch=d_arch, block_size=block_size,
        ctx_pad_t=256, ctx_pad_d=256, K=K, MQ_LEN=sum(fan), R=2,
        fan_out_list=fan, fan_out_list_miss=fan, sampler_x=None, F=F,
    )
    compiled = lowered.compile()  # SPMD partitioner runs here
    assert compiled is not None
