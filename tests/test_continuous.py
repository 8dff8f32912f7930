"""Continuous batching: slot-pool decode produces exactly the tokens an
isolated greedy generate produces, across admissions/evictions."""
import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.data import spark_collator
from rwkvtts_tpu.infer import generate as gen
from rwkvtts_tpu.models import spark
from rwkvtts_tpu.serving.continuous import ContinuousBatcher


class FakeTok:
    def encode(self, text):
        return [ord(c) % 200 + 1 for c in text][:12]


def _prompt(text, tok):
    s = spark_collator.build_prompt(tok.encode(text), [1, 2, 3, 4])
    return spark_collator.pad_prompts_left([s])


def test_continuous_matches_isolated_greedy():
    cfg = spark.default_config(
        hidden_size=64, num_layers=2, head_size=16, gate_lora=16,
        dtype=jnp.float32, wkv_chunk=16, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTok()
    texts = [f"request number {i}" for i in range(5)]
    max_new = 12

    # isolated reference: one greedy generate per request
    expected = {}
    for i, t in enumerate(texts):
        pb = _prompt(t, tok)
        toks, lengths = gen.spark_generate(
            params, cfg, jnp.asarray(pb["tokens"]), jnp.asarray(pb["modality"]),
            jnp.asarray(pb["attention_mask"]), jax.random.PRNGKey(9),
            max_new_tokens=max_new, top_k=1, top_p=1.0,
        )
        n = int(np.asarray(lengths)[0])
        expected[i] = np.asarray(toks)[0, :n].tolist()[:max_new]

    # continuous: 5 requests through 2 slots, 4-step chunks
    cb = ContinuousBatcher(
        params, cfg, n_slots=2, chunk=4, prompt_cap=32, top_k=1,
    )
    rids = {cb.add_request(_prompt(t, tok), max_new): i for i, t in enumerate(texts)}
    out = cb.drain()
    assert len(out) == 5
    for rid, toks in out.items():
        assert toks == expected[rids[rid]], (
            f"slot decode diverged for request {rids[rid]}"
        )


def test_overlap_matches_sequential():
    """Overlap mode (dispatch chunk N+1 before syncing chunk N) returns
    token-identical results: sampling keys are pure functions of each
    request's (seed, own step index), so chunk-boundary timing and the
    one-chunk-later slot frees cannot change any draw. Exercises slot
    reuse (6 requests, 2 slots), sampled (not greedy) decoding, mixed
    per-request seeds/caps, and the stale-owner path."""
    cfg = spark.default_config(
        hidden_size=64, num_layers=2, head_size=16, gate_lora=16,
        dtype=jnp.float32, wkv_chunk=16, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTok()
    texts = [f"overlap request {i}" for i in range(6)]

    def run(overlap):
        cb = ContinuousBatcher(
            params, cfg, n_slots=2, chunk=4, prompt_cap=32,
            top_k=8, top_p=0.9, overlap=overlap,
        )
        rids = {}
        for i, t in enumerate(texts):
            rids[cb.add_request(
                _prompt(t, tok), max_new_tokens=6 + 2 * (i % 3),
                temperature=1.0, seed=100 + i,
            )] = i
        out = cb.drain()
        assert cb.idle()
        return {rids[r]: toks for r, toks in out.items()}

    seq = run(overlap=False)
    ovl = run(overlap=True)
    assert seq == ovl


def test_admission_reuses_freed_slots():
    cfg = spark.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=16, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTok()
    cb = ContinuousBatcher(params, cfg, n_slots=1, chunk=4, prompt_cap=32, top_k=1)
    a = cb.add_request(_prompt("one", tok), 6)
    b = cb.add_request(_prompt("two", tok), 6)
    out = cb.drain()
    assert set(out) == {a, b}
    assert all(0 < len(v) <= 6 for v in out.values())
    assert cb.idle()
    # stats counters tracked the run: both requests admitted, pool ran
    # non-empty, timing buckets accumulated
    st = cb.stats
    assert st["admitted"] == 2 and st["chunks"] >= 2
    assert 0 < st["active_rows"] <= st["chunks"] * cb.n_slots
    assert st["chunk_s"] > 0
    cb.reset_stats()
    assert cb.stats["chunks"] == 0


def test_warmup_then_serve_unchanged():
    """warmup() precompiles every program without corrupting engine state:
    results after warmup equal results without it."""
    cfg = spark.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=16, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTok()

    def run(warm):
        cb = ContinuousBatcher(params, cfg, n_slots=2, chunk=4, prompt_cap=32, top_k=1)
        if warm:
            # multiple prompt widths: precompiles the 64-wide prefill the
            # long prompt below would otherwise compile at admission time
            cb.warmup(prompt_widths=[32, 64])
        rids = [cb.add_request(_prompt(t, tok), 8) for t in ("aa", "bb", "cc")]
        # a prompt past prompt_cap (40 text tokens; FakeTok caps at 12, so
        # build the row directly) exercises the doubled pad bucket
        long_row = spark_collator.build_prompt(
            [i % 150 + 1 for i in range(40)], [1, 2, 3, 4]
        )
        rids.append(
            cb.add_request(spark_collator.pad_prompts_left([long_row]), 8)
        )
        out = cb.drain()
        return [out[r] for r in rids]

    assert run(True) == run(False)


def test_capped_slot_sets_device_done_flag():
    """A slot retired by the max_new cap (no EOS sampled) must flip the
    device-side done flag so it stops burning decode work (ADVICE r2)."""
    cfg = spark.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=16, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTok()
    cb = ContinuousBatcher(params, cfg, n_slots=2, chunk=4, prompt_cap=32, top_k=1)
    # random init never samples EOS in 4 tokens -> retires via cap
    rid = cb.add_request(_prompt("cap me", tok), 4)
    out = {}
    while not cb.idle():
        out.update(cb.step())
    assert rid in out and len(out[rid]) == 4
    done = np.asarray(cb._carry[2])
    assert done.all(), f"capped slot left done=False: {done}"


def test_continuous_packed_wkv_matches_isolated_greedy():
    """Same slot-pool parity with cfg.decode_wkv_packed: the wkv leaves ride
    the head-pair-packed (P, N, 2N) layout, so _insert_many must map request
    rows to slot rows with the H/2 leading-dim factor."""
    cfg = spark.default_config(
        hidden_size=64, num_layers=2, head_size=16, gate_lora=16,
        dtype=jnp.float32, wkv_chunk=16, remat=False, dropout=0.0,
        decode_wkv_packed=True,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTok()
    texts = [f"packed req {i}" for i in range(4)]
    max_new = 10

    expected = {}
    for i, t in enumerate(texts):
        pb = _prompt(t, tok)
        toks, lengths = gen.spark_generate(
            params, cfg, jnp.asarray(pb["tokens"]), jnp.asarray(pb["modality"]),
            jnp.asarray(pb["attention_mask"]), jax.random.PRNGKey(9),
            max_new_tokens=max_new, top_k=1, top_p=1.0,
        )
        n = int(np.asarray(lengths)[0])
        expected[i] = np.asarray(toks)[0, :n].tolist()[:max_new]

    cb = ContinuousBatcher(params, cfg, n_slots=2, chunk=4, prompt_cap=32, top_k=1)
    rids = {cb.add_request(_prompt(t, tok), max_new): i for i, t in enumerate(texts)}
    out = cb.drain()
    assert len(out) == 4
    for rid, toks in out.items():
        assert toks == expected[rids[rid]], (
            f"packed slot decode diverged for request {rids[rid]}"
        )


def test_dp_sharded_pool_matches_unsharded():
    """Slot pool sharded over a dp mesh (pod-scale serving) must produce
    exactly the tokens the single-device pool produces: decode-step math is
    batch-row-independent, so GSPMD splitting the slot axis cannot change
    results (same claim as tests/test_sharded_decode.py, at the serving
    engine level)."""
    from rwkvtts_tpu.parallel import mesh as mesh_lib

    cfg = spark.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=16, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTok()
    texts = [f"sharded pool req {i}" for i in range(6)]
    max_new = 10

    def run(mesh):
        cb = ContinuousBatcher(
            params, cfg, n_slots=4, chunk=4, prompt_cap=32, top_k=1,
            mesh=mesh,
        )
        rids = {
            cb.add_request(_prompt(t, tok), max_new): i
            for i, t in enumerate(texts)
        }
        return {rids[r]: t for r, t in cb.drain().items()}

    base = run(None)
    mesh = mesh_lib.make_mesh(dp=4)
    sharded = run(mesh)
    assert sharded == base


def test_per_request_sampling_params_ride_slots():
    """Per-request temperature/top_p live in the slot carry: a near-zero-
    temperature request must reproduce the isolated greedy decode even when
    it shares the pool (and one compiled chunk program) with a hot-
    temperature request, and the hot slot must actually explore (diverge
    from greedy) — the reference's service has no per-request sampling at
    all (service/rwkv_tts_service.py)."""
    cfg = spark.default_config(
        hidden_size=64, num_layers=2, head_size=16, gate_lora=16,
        dtype=jnp.float32, wkv_chunk=16, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTok()
    max_new = 12

    pb = _prompt("cold deterministic request", tok)
    toks, lengths = gen.spark_generate(
        params, cfg, jnp.asarray(pb["tokens"]), jnp.asarray(pb["modality"]),
        jnp.asarray(pb["attention_mask"]), jax.random.PRNGKey(9),
        max_new_tokens=max_new, top_k=1, top_p=1.0,
    )
    n = int(np.asarray(lengths)[0])
    greedy = np.asarray(toks)[0, :n].tolist()[:max_new]

    cb = ContinuousBatcher(
        params, cfg, n_slots=2, chunk=4, prompt_cap=32,
        top_k=0, temperature=1.0, top_p=1.0,  # pool default: full sampling
    )
    cold = cb.add_request(pb, max_new, temperature=1e-6)
    hot = cb.add_request(
        _prompt("cold deterministic request", tok), max_new, temperature=3.0
    )
    out = cb.drain()
    assert out[cold] == greedy
    assert out[hot] != greedy  # same prompt, hot slot must explore


def test_seed_determinism_across_pool_mixes():
    """A (prompt, seed) request reproduces EXACTLY no matter what else
    shares the pool: each row's sampling key is fold_in(PRNGKey(seed),
    own-step-index), independent of slot position, admission timing, and
    chunk counters. Different seeds must differ."""
    cfg = spark.default_config(
        hidden_size=64, num_layers=2, head_size=16, gate_lora=16,
        dtype=jnp.float32, wkv_chunk=16, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTok()
    max_new = 10
    target = _prompt("the reproducible request", tok)

    def run(n_slots, chunk, others, seed=123):
        cb = ContinuousBatcher(
            params, cfg, n_slots=n_slots, chunk=chunk, prompt_cap=32,
            top_k=0, temperature=1.0, top_p=1.0,
        )
        # admit decoys first so the target lands in different slots with
        # different admission timing across configurations
        for i in range(others):
            cb.add_request(_prompt(f"decoy {i}", tok), max_new, seed=7 + i)
        rid = cb.add_request(target, max_new, seed=seed)
        return cb.drain()[rid]

    alone = run(n_slots=2, chunk=4, others=0)
    crowded = run(n_slots=3, chunk=5, others=4)
    assert crowded == alone, "pool cohabitation changed a seeded request"
    assert run(n_slots=2, chunk=4, others=0, seed=124) != alone


def test_mega_insert_matches_full_pack():
    """_insert_many_mega's per-request lane scatter must reproduce
    pack_mega_state_b64's full-batch transpose exactly: insert all 64 rows
    of a random raw state one slot at a time into a fresh mega carry and
    compare against packing the whole batch at once."""
    import jax.numpy as jnp

    from rwkvtts_tpu.models import rwkv7
    from rwkvtts_tpu.ops import decode_mega_b64 as dmb
    from rwkvtts_tpu.serving import continuous as cont

    # hidden 256 -> H=4 heads, P=2 pairs: a P=1 config cannot distinguish
    # the head-pair split (head = 2p+h vs strided) between the two layouts
    cfg = spark.default_config(
        hidden_size=256, num_layers=2, dtype=jnp.float32,
        wkv_chunk=16, remat=False, dropout=0.0,
    )
    bb = cfg.backbone
    k = jax.random.PRNGKey(3)
    ks = jax.random.split(k, 4)
    raw = {
        "att_x": jax.random.normal(ks[0], (2, 64, 256), jnp.float32),
        "wkv": jax.random.normal(ks[1], (2, 64, 4, 64, 64), jnp.float32),
        "ffn_x": jax.random.normal(ks[2], (2, 64, 256), jnp.float32),
    }
    hk = jax.random.normal(ks[3], (64, 256), jnp.float32)

    expected = dmb.pack_mega_state_b64(raw, bb)

    fresh = dmb.pack_mega_state_b64(rwkv7.init_model_state(bb, 64), bb)
    carry = (
        jnp.zeros((64, 256), jnp.float32),
        fresh,
        jnp.ones((64,), bool),
        jnp.zeros((64,), jnp.int32),
        jnp.ones((64,), jnp.float32),
        jnp.ones((64,), jnp.float32),
        jnp.zeros((64,), jnp.int32),
    )
    # shuffled slot order: slot assignment must not depend on insert order
    order = np.random.RandomState(0).permutation(64).astype(np.int32)
    carry = cont._insert_many_mega(
        carry, hk[order], jax.tree.map(lambda x: x[:, order], raw),
        order, np.int32(64),
        np.ones((64,), np.float32), np.ones((64,), np.float32),
        np.zeros((64,), np.int32),
    )
    h, st, done = carry[0], carry[1], carry[2]
    np.testing.assert_array_equal(np.asarray(h), np.asarray(hk))
    assert not np.asarray(done).any()
    for leaf in ("att_x", "wkv", "ffn_x"):
        np.testing.assert_array_equal(
            np.asarray(st[leaf]), np.asarray(expected[leaf]), err_msg=leaf
        )


def test_mega_pool_matches_mega_generate():
    """The megakernel-backed pool (ContinuousBatcher(megakernel=True))
    produces exactly the tokens spark_generate_mega_b64 produces for the
    same 64 prompts under greedy decoding — admission scatter, chunked
    scan, and per-slot EOS/done handling included."""
    cfg = spark.default_config(
        hidden_size=128, num_layers=2, dtype=jnp.float32,
        wkv_chunk=16, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTok()
    max_new = 6
    texts = [f"mega pool request {i}" for i in range(64)]
    pbs = [_prompt(t, tok) for t in texts]

    from rwkvtts_tpu.infer.generate import spark_generate_mega_b64
    from rwkvtts_tpu.ops import decode_mega_b64 as dmb
    from rwkvtts_tpu.serving import pool_common

    stacked = pool_common.stack_admission(
        [pool_common.pad_prompt(b, 32) for b in pbs]
    )
    mega = dmb.pack_mega_b64(params, cfg.backbone, tile_n=128)
    spec = mega.pop("spec")
    toks, lengths = spark_generate_mega_b64(
        params, mega, spec, cfg,
        jnp.asarray(stacked["tokens"]), jnp.asarray(stacked["modality"]),
        jnp.asarray(stacked["attention_mask"]), jax.random.PRNGKey(9),
        max_new_tokens=max_new, top_k=1, top_p=1.0,
    )
    toks, lengths = np.asarray(toks), np.asarray(lengths)
    expected = {
        i: toks[i, : min(int(lengths[i]), max_new)].tolist()
        for i in range(64)
    }

    cb = ContinuousBatcher(
        params, cfg, n_slots=64, chunk=3, prompt_cap=32, top_k=1,
        megakernel=True, mega_tile_n=128,
    )
    rids = {cb.add_request(pbs[i], max_new): i for i in range(64)}
    out = cb.drain()
    assert cb.idle()
    got = {rids[r]: v for r, v in out.items()}
    assert got == expected
