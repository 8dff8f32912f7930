"""Pooled Cosy decoding + concurrent streaming (serving/cosy_pool.py):
slot cohabitation must not change any stream's tokens or audio."""
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.data import cosy_collator
from rwkvtts_tpu.data.spark_collator import pad_prompts_left
from rwkvtts_tpu.models import cosy
from rwkvtts_tpu.serving.cosy_pool import CosyPoolBatcher, CosyStreamHub


class FakeTok:
    def encode(self, text):
        return [ord(c) % 200 + 1 for c in text][:8]


@pytest.fixture(scope="module")
def lm():
    cfg = cosy.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=16, remat=False,
    )
    params = cosy.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _prompt(text):
    sample = cosy_collator.build_prompt(FakeTok().encode(text), [])
    return pad_prompts_left([sample])


def test_pool_request_purity(lm):
    """The same (prompt, seed) request produces identical tokens whether it
    runs alone or alongside other requests (per-row fold_in keys)."""
    cfg, params = lm

    def run(texts_seeds):
        cb = CosyPoolBatcher(params, cfg, n_slots=2, chunk=4, prompt_cap=32)
        rids = {
            cb.add_request(_prompt(t), 12, min_new_tokens=2, seed=s): (t, s)
            for t, s in texts_seeds
        }
        out = cb.drain()
        return {rids[r]: v for r, v in out.items()}

    alone = run([("hello", 7)])
    crowd = run([("hello", 7), ("wxyz", 1), ("abc", 2)])
    assert crowd[("hello", 7)] == alone[("hello", 7)]
    assert len(crowd) == 3


def test_pool_min_max_bounds(lm):
    """min_new suppresses EOS below the bound; max_new caps the length."""
    cfg, params = lm
    cb = CosyPoolBatcher(params, cfg, n_slots=2, chunk=4, prompt_cap=32)
    ra = cb.add_request(_prompt("aaaa"), 10, min_new_tokens=6, seed=0)
    rb = cb.add_request(_prompt("bbbb"), 3, min_new_tokens=0, seed=1)
    out = cb.drain()
    assert 6 <= len(out[ra]) <= 10
    assert len(out[rb]) <= 3
    eos = cfg.eos_token_id
    assert all(t != eos for t in out[ra])
    assert cb.idle()


def test_pool_incremental_events(lm):
    """step() delivers partial tokens: concatenated events equal drain()'s
    final sequence, with done flagged exactly once per request."""
    cfg, params = lm
    cb = CosyPoolBatcher(params, cfg, n_slots=1, chunk=4, prompt_cap=32)
    rid = cb.add_request(_prompt("hello"), 10, min_new_tokens=2, seed=7)
    acc, dones = [], 0
    while not cb.idle():
        for r, new, done in cb.step():
            assert r == rid
            acc.extend(new.tolist())
            dones += int(done)
    assert dones == 1
    cb2 = CosyPoolBatcher(params, cfg, n_slots=1, chunk=4, prompt_cap=32)
    rid2 = cb2.add_request(_prompt("hello"), 10, min_new_tokens=2, seed=7)
    assert acc == cb2.drain()[rid2]


def test_pool_warmup_unchanged(lm):
    cfg, params = lm
    cfg_eos = cfg  # silence linters

    def run(warm):
        cb = CosyPoolBatcher(params, cfg, n_slots=2, chunk=4, prompt_cap=32)
        if warm:
            cb.warmup(prompt_widths=[32, 64])
        rids = [
            cb.add_request(_prompt(t), 8, seed=i)
            for i, t in enumerate(("aa", "bb", "cc"))
        ]
        out = cb.drain()
        return [out[r] for r in rids]

    assert run(True) == run(False)


def test_pool_cancel_frees_slot(lm):
    """cancel() frees the slot (and the queue) so an abandoned client
    stops burning decode work."""
    cfg, params = lm
    cb = CosyPoolBatcher(params, cfg, n_slots=1, chunk=4, prompt_cap=32)
    ra = cb.add_request(_prompt("aaaa"), 1000, min_new_tokens=900, seed=0)
    rb = cb.add_request(_prompt("bbbb"), 8, seed=1)  # waits in the queue
    cb.step()  # ra occupies the slot
    cb.cancel(ra)
    out = cb.drain()  # rb admits into the freed slot and finishes
    assert ra not in out and rb in out
    assert cb.idle()


@pytest.fixture(scope="module")
def tiny_pipe(lm):
    """Tiny LM + flow/HiFT CosyPipeline for hub-level tests."""
    from rwkvtts_tpu.codecs import conformer, flow as flow_lib, hift as hift_lib
    from rwkvtts_tpu.infer.cosy_pipeline import CosyPipeline

    cfg, params = lm
    fcfg = flow_lib.FlowConfig(
        input_size=24, output_size=16, spk_embed_dim=12, vocab_size=6562,
        encoder=conformer.UpsampleConformerConfig(
            input_size=24, output_size=24, attention_heads=2,
            linear_units=48, num_blocks=1, num_up_blocks=1,
        ),
        estimator=flow_lib.EstimatorConfig(
            in_channels=16 * 4, out_channels=16, channels=(16,),
            n_blocks=1, num_mid_blocks=1, num_heads=2, attention_head_dim=8,
            causal=True, static_chunk_size=2,
        ),
        n_timesteps=2,
    )
    fparams = flow_lib.init_params(jax.random.PRNGKey(1), fcfg)
    hcfg = hift_lib.HiFTConfig(
        in_channels=16, base_channels=32, nb_harmonics=2,
        upsample_rates=(4, 3), upsample_kernel_sizes=(8, 7),
        istft_n_fft=16, istft_hop_len=4,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
        source_resblock_kernel_sizes=(7, 7),
        source_resblock_dilation_sizes=((1, 2), (1, 2)),
        f0_cond_channels=16,
    )
    hparams = hift_lib.init_params(jax.random.PRNGKey(2), hcfg)
    return CosyPipeline(
        cfg, params, FakeTok(),
        flow_cfg=fcfg, flow_params=fparams,
        hift_cfg=hcfg, hift_params=hparams,
    )


def test_hub_concurrent_streams_match_solo(tiny_pipe):
    """Two streams running CONCURRENTLY through the hub produce exactly the
    wav each produces when streamed alone (pool cohabitation is inaudible)."""
    pipe = tiny_pipe

    def collect_solo(text, seed):
        hub = CosyStreamHub(pipe, n_slots=2, chunk=4, prompt_cap=32)
        try:
            chunks = list(
                hub.stream(text, hop_tokens=4, seed=seed, max_new_tokens=12)
            )
        finally:
            hub.close()
        return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    solo_a = collect_solo("hello", 7)
    solo_b = collect_solo("wxyz", 3)

    hub = CosyStreamHub(pipe, n_slots=2, chunk=4, prompt_cap=32)
    results = {}

    def worker(name, text, seed):
        chunks = list(
            hub.stream(text, hop_tokens=4, seed=seed, max_new_tokens=12)
        )
        results[name] = (
            np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
        )

    try:
        ts = [
            threading.Thread(target=worker, args=("a", "hello", 7)),
            threading.Thread(target=worker, args=("b", "wxyz", 3)),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
    finally:
        hub.close()

    np.testing.assert_allclose(results["a"], solo_a, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results["b"], solo_b, rtol=1e-5, atol=1e-6)


def test_pool_overlap_matches_sequential(lm):
    """Overlap mode (dispatch chunk N+1 before syncing N) delivers
    token-identical sequences: per-row keys are pure functions of each
    request's (seed, step index), so the one-chunk-later slot free and
    readmission cannot change any draw."""
    cfg, params = lm

    def run(overlap):
        cb = CosyPoolBatcher(
            params, cfg, n_slots=2, chunk=4, prompt_cap=32, overlap=overlap
        )
        rids = [
            cb.add_request(_prompt(t), 10, min_new_tokens=2, seed=i)
            for i, t in enumerate(("hello", "wxyz", "abc"))
        ]
        out = cb.drain()
        return [out[r] for r in rids]

    assert run(True) == run(False)


def test_hub_pump_failure_surfaces_and_recovers(tiny_pipe):
    """A decode failure on the pump thread must NOT silently hang every
    stream: live consumers get a RuntimeError and the pool resets so the
    next request works."""
    hub = CosyStreamHub(tiny_pipe, n_slots=2, chunk=4, prompt_cap=32)
    try:
        boom = {"armed": True}
        orig_step = hub.batcher.step

        def flaky_step():
            if boom["armed"]:
                boom["armed"] = False
                raise RuntimeError("injected device fault")
            return orig_step()

        hub.batcher.step = flaky_step
        with pytest.raises(RuntimeError, match="injected device fault"):
            list(hub.stream("hello", hop_tokens=4, seed=7,
                            max_new_tokens=12))
        # the pool reset: a fresh stream completes normally
        chunks = list(hub.stream("hello", hop_tokens=4, seed=7,
                                 max_new_tokens=12))
        assert all(np.isfinite(c).all() for c in chunks)
    finally:
        hub.close()


def test_hub_oversized_seed_is_clamped_not_fatal(tiny_pipe):
    """|seed| >= 2**31 must not OverflowError on the pump thread."""
    hub = CosyStreamHub(tiny_pipe, n_slots=1, chunk=4, prompt_cap=32)
    try:
        chunks = list(hub.stream("hello", hop_tokens=4, seed=2**31 + 7,
                                 max_new_tokens=8))
        assert all(np.isfinite(c).all() for c in chunks)
    finally:
        hub.close()


def test_hub_first_chunk_priority_bookkeeping(tiny_pipe):
    """First-chunk priority must never wedge the hub: an abandoned stream
    (consumer stops before first audio) leaves the pending-first set, and
    concurrent streams all finish with the deferral active."""
    hub = CosyStreamHub(tiny_pipe, n_slots=2, chunk=4, prompt_cap=32)
    try:
        assert hub.first_chunk_priority
        # abandon one stream before consuming anything
        g = hub.stream("abandoned", hop_tokens=4, seed=5, max_new_tokens=12)
        g.close()  # generator never started: admission never happened
        results = {}

        def worker(name, text, seed):
            results[name] = list(
                hub.stream(text, hop_tokens=4, seed=seed, max_new_tokens=12)
            )

        ts = [
            threading.Thread(target=worker, args=("a", "hello", 7)),
            threading.Thread(target=worker, args=("b", "wxyz", 3)),
        ]
        for t in ts:
            t.start()
        # abandon a third stream mid-flight: consume exactly one chunk
        g2 = hub.stream("midway", hop_tokens=4, seed=9, max_new_tokens=12)
        next(g2, None)
        g2.close()
        for t in ts:
            t.join(timeout=300)
        assert all(len(v) > 0 for v in results.values())
        with hub._first_cv:
            assert not hub._first_pending
    finally:
        hub.close()
