"""Autoregressive generation: greedy, sampling, and beam search.

TPU-native decode loop: prompt prefill fills a fixed-size KV cache in one
pass, then a jitted ``lax.while_loop`` emits one token per step with static
shapes throughout and EARLY EXIT once every sequence has finished (the
reference gets decoding + early_stopping from HF ``generate``;
SURVEY.md section 7 lists the scan+kv-cache loop as a hard part).

Compiled decode functions are cached at module level keyed on
(graphdef, GenerationConfig) -- and intervention locations enter as a
TRACED array argument so per-batch ReFT positions never force a retrace.
(Round-1 defined ``@jax.jit`` inside the generate body, recompiling every
eval batch; for 7-dataset beam-4 math evals that dominated wall-clock.)

Inputs are LEFT-padded (the reference flips padding_side for generation,
compute_metrics.py:118); positions derive from the attention mask so RoPE
sees contiguous positions regardless of padding.

Beam search follows HF semantics for the reasoning evals (beam 4,
early_stopping, length-normalised scores -- task_config generation_args).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models.llama import init_caches

Array = jax.Array

NEG = -1e9


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    """Hashable so compiled decode fns can be cached per config."""
    max_new_tokens: int = 32
    eos_token_id: Optional[int] = 2
    pad_token_id: int = 0
    num_beams: int = 1
    do_sample: bool = False
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    length_penalty: float = 1.0
    early_stopping: bool = True
    # decode constraints (reference alpaca generation_args,
    # task_config.py:108-120: repetition_penalty 1.1, no_repeat_ngram 5)
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: int = 0


def _positions_from_mask(mask: Array) -> Array:
    return jnp.maximum(jnp.cumsum(mask, axis=-1) - 1, 0)


def _sample_logits(logits, key, cfg: GenerationConfig):
    logits = logits.astype(jnp.float32)
    if not cfg.do_sample:
        return jnp.argmax(logits, -1)
    logits = logits / jnp.maximum(cfg.temperature, 1e-6)
    if cfg.top_k and cfg.top_k > 0:
        k = min(cfg.top_k, logits.shape[-1])  # HF clamps top_k to vocab
        kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
        logits = jnp.where(logits < kth, NEG, logits)
    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, -1)
        cum = jnp.cumsum(probs, -1)
        cutoff_idx = jnp.sum(cum < cfg.top_p, -1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, -1)
        logits = jnp.where(logits < cutoff, NEG, logits)
    return jax.random.categorical(key, logits, -1)


def _apply_repetition_penalty(logits, presence, penalty: float):
    """CTRL-style: divide positive / multiply negative logits of every
    token already present in the sequence (HF RepetitionPenaltyLogitsProcessor
    semantics, applied over prompt + generated tokens)."""
    lp = logits.astype(jnp.float32)
    pen = jnp.where(lp > 0, lp / penalty, lp * penalty)
    return jnp.where(presence, pen, lp)


def _prompt_presence(input_ids, vocab: int):
    """(b, V) bool: tokens present in the prompt, PADS INCLUDED -- HF's
    RepetitionPenaltyLogitsProcessor gathers over the full padded
    input_ids, so the pad token is penalized for padded rows; matched
    exactly for decode parity with the reference engine."""
    b = input_ids.shape[0]
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], input_ids.shape)
    return jnp.zeros((b, vocab), bool).at[rows, input_ids].set(True)


def _ban_repeated_ngrams(logits, seq_full, cur_len, n: int):
    """NEG out any token that would complete an n-gram already present in
    seq_full[:, :cur_len] (HF NoRepeatNGramLogitsProcessor semantics).

    seq_full: (b, L) prompt+generated buffer; cur_len: scalar count of
    filled slots.  All window comparisons are static-shape; validity
    masking handles the dynamic length.
    """
    b, L = seq_full.shape
    # last (n-1) tokens = the prefix the next token would extend
    prefix = jax.lax.dynamic_slice_in_dim(
        seq_full, cur_len - (n - 1), n - 1, axis=1)  # (b, n-1)
    nwin = L - n + 1
    eq = jnp.ones((b, nwin), bool)
    for k in range(n - 1):
        eq &= seq_full[:, k:k + nwin] == prefix[:, k:k + 1]
    # window s matches when its (n-1)-prefix equals ours AND its banned
    # token (index s+n-1) lies inside the already-generated region
    valid = (jnp.arange(nwin) + n - 1) < cur_len
    eq &= valid[None, :]
    banned_tok = seq_full[:, n - 1:]  # (b, nwin): token following window s
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], banned_tok.shape)
    banned = jnp.zeros(logits.shape, bool).at[rows, banned_tok].max(eq)
    return jnp.where(banned, NEG, logits.astype(jnp.float32))


def _resolve_hooks(m, locs, legacy_hooks):
    """Hooks for the prefill: built in-trace from the traced ``locs`` array
    (ReftModel._hooks), or the caller's pre-built closures (legacy path)."""
    if legacy_hooks is not None:
        return legacy_hooks
    if locs is not None:
        return m._hooks(locs)
    return None


@functools.lru_cache(maxsize=64)
def _compiled_greedy(graphdef, cfg: GenerationConfig, has_locs: bool,
                     legacy_hooks=None):
    """jit'd greedy/sampling decode; compiled once per (graphdef, cfg,
    input shapes) and reused across eval batches."""

    @jax.jit
    def run(state, input_ids, attention_mask, rng, locs):
        m = nnx.merge(graphdef, state)
        mcfg = m.config
        b, t = input_ids.shape
        total = t + cfg.max_new_tokens
        dtype = mcfg.compute_dtype or jnp.float32
        caches = init_caches(mcfg, b, total, dtype)
        mask_full = jnp.concatenate(
            [attention_mask, jnp.zeros((b, total - t), attention_mask.dtype)], -1)
        positions = _positions_from_mask(attention_mask)
        hooks = _resolve_hooks(m, locs if has_locs else None, legacy_hooks)
        logits, caches = m(input_ids, attention_mask=mask_full, positions=positions,
                           caches=caches, cache_index=0,
                           layer_hooks=hooks)
        last_logit = logits[:, -1]
        next_pos = positions[:, -1] + 1  # (b,)
        out_toks = jnp.full((b, cfg.max_new_tokens), cfg.pad_token_id, jnp.int32)
        finished = jnp.zeros((b,), bool)

        use_pen = cfg.repetition_penalty != 1.0
        use_ngram = cfg.no_repeat_ngram_size > 0
        rows = jnp.arange(b)
        if use_pen:
            presence = _prompt_presence(input_ids, logits.shape[-1])
        else:
            presence = jnp.zeros((b, 1), bool)  # uniform carry, unused

        def cond(carry):
            i, finished = carry[0], carry[5]
            not_done = i < cfg.max_new_tokens
            # HF greedy stops when every row has hit EOS regardless of
            # early_stopping (a beam-search-only knob); output is identical,
            # the exit just skips wasted pad-emitting steps
            if cfg.eos_token_id is not None:
                not_done = not_done & ~jnp.all(finished)
            return not_done

        def step(carry):
            (i, caches, mask_full, last_logit, pos, finished, rng, out_toks,
             presence) = carry
            rng, key = jax.random.split(rng)
            lg = last_logit
            if use_pen:
                lg = _apply_repetition_penalty(
                    lg, presence, cfg.repetition_penalty)
            if use_ngram:
                n = cfg.no_repeat_ngram_size
                seq_full = jnp.concatenate([input_ids, out_toks], axis=1)
                cur_len = t + i
                banned = _ban_repeated_ngrams(lg, seq_full, cur_len, n)
                # no bans until an n-gram can exist (HF semantics)
                lg = jnp.where(cur_len >= n, banned, lg.astype(jnp.float32))
            tok = _sample_logits(lg, key, cfg)
            tok = jnp.where(finished, cfg.pad_token_id, tok)
            if use_pen:
                presence = presence.at[rows, tok].set(True)
            if cfg.eos_token_id is not None:
                finished = finished | (tok == cfg.eos_token_id)
            out_toks = jax.lax.dynamic_update_slice_in_dim(
                out_toks, tok[:, None], i, axis=1)
            # mark the slot we are about to write as attendable
            slot = t + i
            mask_full = jax.lax.dynamic_update_slice_in_dim(
                mask_full, jnp.ones((b, 1), mask_full.dtype), slot, axis=1)
            logits, caches = m(tok[:, None], attention_mask=mask_full,
                               positions=pos[:, None], caches=caches,
                               cache_index=slot)
            return (i + 1, caches, mask_full, logits[:, 0], pos + 1,
                    finished, rng, out_toks, presence)

        carry = (jnp.int32(0), caches, mask_full, last_logit, next_pos,
                 finished, rng, out_toks, presence)
        carry = jax.lax.while_loop(cond, step, carry)
        return carry[7]  # out_toks (b, max_new)

    return run


def generate(model, input_ids, attention_mask, gen_config: GenerationConfig,
             rng: Optional[Array] = None, prefill_hooks=None,
             intervention_locations=None):
    """Generate continuations.  input_ids/attention_mask: (B, T) LEFT-padded.

    intervention_locations: optional (B, num_interventions, p) TRACED array
    of ReFT prompt positions (model must expose ``_hooks``); preferred over
    prefill_hooks because the compiled decode is reused across batches
    (ReFT intervene_on_prompt semantics -- reference compute_metrics.py:172-187).
    prefill_hooks: optional {layer: fn} pre-built closures (legacy; forces
    a fresh compile per call).

    Returns (B, T + max_new_tokens) sequences (prompt + generation, padded
    with pad_token_id after EOS).
    """
    if gen_config.num_beams > 1:
        if (gen_config.repetition_penalty != 1.0
                or gen_config.no_repeat_ngram_size > 0):
            raise NotImplementedError(
                "repetition_penalty / no_repeat_ngram_size are implemented "
                "for the greedy/sampling decode only (the reference recipes "
                "use them with num_beams=1 -- task_config.py alpaca)")
        if gen_config.do_sample and (gen_config.top_k > 0
                                     or gen_config.top_p < 1.0):
            raise NotImplementedError(
                "beam-sample supports temperature only (HF applies top-k/"
                "top-p warpers there too; unimplemented -- raise, don't "
                "silently ignore)")
        return beam_generate(model, input_ids, attention_mask, gen_config,
                             rng=rng,
                             prefill_hooks=prefill_hooks,
                             intervention_locations=intervention_locations)
    graphdef, state = nnx.split(model)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    has_locs = intervention_locations is not None
    if prefill_hooks is not None:
        # legacy closures are unhashable per-call objects: bypass the cache
        run = _compiled_greedy.__wrapped__(graphdef, gen_config, False,
                                           _FreshHooks(prefill_hooks))
    else:
        run = _compiled_greedy(graphdef, gen_config, has_locs)
    locs = jnp.asarray(intervention_locations) if has_locs else None
    toks = run(state, jnp.asarray(input_ids), jnp.asarray(attention_mask),
               rng, locs)
    return jnp.concatenate([jnp.asarray(input_ids), toks], axis=-1)


class _FreshHooks(dict):
    """Marker dict for the legacy prefill_hooks path (not cached)."""


@functools.lru_cache(maxsize=64)
def _compiled_beam(graphdef, cfg: GenerationConfig, has_locs: bool,
                   legacy_hooks=None):
    """HF-parity beam search, mirroring transformers' vectorized
    ``_beam_search`` (generation/utils.py:3113, v4.57): a 2K candidate
    pool per step, a K-slot finished-hypothesis bank scored by
    sum-logprobs / generated_length**length_penalty, the early-stop
    improvement heuristic, and the same three-way stop condition.  Running
    beams are refilled from the non-finished candidates, so an EOS beam
    never freezes a live search slot.  ``do_sample`` selects the 2K
    candidates by Gumbel-top-k (= sampling without replacement, HF's
    ``torch.multinomial``) -- distributionally faithful, not RNG-identical.
    """
    K = cfg.num_beams
    K2 = 2 * K  # beams_to_keep = max(2, 1 + n_eos) * K with 0 or 1 EOS

    @jax.jit
    def run(state, input_ids, attention_mask, rng, locs):
        m = nnx.merge(graphdef, state)
        mcfg = m.config
        b, t = input_ids.shape
        N = cfg.max_new_tokens
        total = t + N
        dtype = mcfg.compute_dtype or jnp.float32
        bk = b * K

        def expand(x):  # (b, ...) -> (b*K, ...)
            return jnp.repeat(x, K, axis=0)

        ids_k = expand(input_ids)
        mask_k = expand(attention_mask)
        caches = init_caches(mcfg, bk, total, dtype)
        mask_full = jnp.concatenate(
            [mask_k, jnp.zeros((bk, total - t), mask_k.dtype)], -1)
        positions = _positions_from_mask(mask_k)
        # locations arrive already beam-expanded (b*K, ...) from the caller
        hooks = _resolve_hooks(m, locs if has_locs else None, legacy_hooks)
        logits, caches = m(ids_k, attention_mask=mask_full, positions=positions,
                           caches=caches, cache_index=0,
                           layer_hooks=hooks)
        last_logit = logits[:, -1]
        next_pos = positions[:, -1] + 1

        # beam 0 active, others -inf so the first step picks K distinct tokens
        run_scores = jnp.tile(jnp.array([0.0] + [NEG] * (K - 1),
                                        jnp.float32), (b, 1))       # (b, K)
        # HF fill rule (utils.py:3227 `pad_token_id or eos_token_id[0]`):
        # a falsy pad id (0) makes EOS the fill for finished hypotheses'
        # tails -- replicated for token-exact parity
        if cfg.eos_token_id is not None:
            fill = cfg.pad_token_id or cfg.eos_token_id
        else:
            fill = cfg.pad_token_id if cfg.pad_token_id is not None else -1
        run_toks = jnp.full((b, K, N), fill, jnp.int32)
        bank_scores = jnp.full((b, K), NEG, jnp.float32)
        bank_toks = jnp.full((b, K, N), fill, jnp.int32)
        bank_fin = jnp.zeros((b, K), bool)
        heur_unsat = jnp.ones((b, 1), bool)
        lp = cfg.length_penalty
        es = cfg.early_stopping is True

        def take1(x, idx):  # (b, M) gathered to (b, k)
            return jnp.take_along_axis(x, idx, axis=1)

        def cond(carry):
            return (carry[0] < N) & ~carry[-1]

        def step(carry):
            (i, caches, mask_full, last_logit, pos, run_scores, run_toks,
             bank_scores, bank_toks, bank_fin, heur_unsat, rng, _done) = carry
            logp = jax.nn.log_softmax(last_logit.astype(jnp.float32), -1)
            if cfg.do_sample and cfg.temperature != 1.0:
                # HF applies the temperature warper to the log-probs that
                # then accumulate into the beam scores
                logp = logp / max(cfg.temperature, 1e-6)
            V = logp.shape[-1]
            cand = (logp.reshape(b, K, V)
                    + run_scores[:, :, None]).reshape(b, K * V)
            if cfg.do_sample:
                rng, sub = jax.random.split(rng)
                gumbel = jax.random.gumbel(sub, cand.shape, jnp.float32)
                _, idx2k = jax.lax.top_k(cand + gumbel, K2)
                sc2k = take1(cand, idx2k)
            else:
                sc2k, idx2k = jax.lax.top_k(cand, K2)       # (b, 2K)
            src = idx2k // V                                # (b, 2K)
            tok = (idx2k % V).astype(jnp.int32)
            cand_toks = jnp.take_along_axis(run_toks, src[:, :, None], axis=1)
            cand_toks = jax.lax.dynamic_update_slice_in_dim(
                cand_toks, tok[:, :, None], i, axis=2)      # (b, 2K, N)
            # stopping criteria per candidate: EOS token or max length
            hits = jnp.full(tok.shape, i + 1 >= N)
            if cfg.eos_token_id is not None:
                hits = hits | (tok == cfg.eos_token_id)

            # next running beams: best K non-finished candidates
            run_sel_scores, run_sel_idx = jax.lax.top_k(
                sc2k + hits.astype(jnp.float32) * NEG, K)   # (b, K)
            new_run_toks = jnp.take_along_axis(
                cand_toks, run_sel_idx[:, :, None], axis=1)
            new_src = take1(src, run_sel_idx)               # (b, K)
            new_tok = take1(tok, run_sel_idx)               # (b, K)
            flat_src = (jnp.arange(b)[:, None] * K + new_src).reshape(-1)

            def gather(x):
                return jnp.take(x, flat_src, axis=0)

            caches = jax.tree.map(gather, caches)
            mask_full = gather(mask_full)
            pos = gather(pos)

            # bank update: finished candidates in the top-K ranks join the
            # K-slot bank if the batch can still improve
            gen_len = (i + 1).astype(jnp.float32)
            norm = sc2k / (gen_len ** lp)
            rank_ok = (jnp.arange(K2) < K)[None]
            batch_full = jnp.all(bank_fin, -1, keepdims=True) & es
            addable = hits & rank_ok & ~batch_full & heur_unsat
            merged_scores = jnp.concatenate(
                [bank_scores, jnp.where(addable, norm, NEG)], axis=1)
            merged_fin = jnp.concatenate([bank_fin, addable], axis=1)
            merged_toks = jnp.concatenate([bank_toks, cand_toks], axis=1)
            bank_scores, top_i = jax.lax.top_k(merged_scores, K)
            bank_fin = take1(merged_fin, top_i)
            bank_toks = jnp.take_along_axis(
                merged_toks, top_i[:, :, None], axis=1)

            # early-stop heuristic: can the best running beam still beat
            # the worst banked hypothesis?  (sticky once satisfied)
            best_possible = run_sel_scores[:, :1] / (gen_len ** lp)
            worst_fin = jnp.where(
                bank_fin, jnp.min(bank_scores, -1, keepdims=True), NEG)
            heur_unsat = heur_unsat & jnp.any(
                best_possible > worst_fin, -1, keepdims=True)
            improvement = jnp.any(heur_unsat)
            exists_open = ~(jnp.all(bank_fin) & es)
            valid_cont = ~jnp.all(hits)
            done = ~(improvement & exists_open & valid_cont)

            slot = t + i
            mask_full = jax.lax.dynamic_update_slice_in_dim(
                mask_full, jnp.ones((bk, 1), mask_full.dtype), slot, axis=1)
            logits, caches = m(new_tok.reshape(-1)[:, None],
                               attention_mask=mask_full,
                               positions=pos[:, None], caches=caches,
                               cache_index=slot)
            return (i + 1, caches, mask_full, logits[:, 0], pos + 1,
                    run_sel_scores, new_run_toks, bank_scores, bank_toks,
                    bank_fin, heur_unsat, rng, done)

        carry = (jnp.int32(0), caches, mask_full, last_logit, next_pos,
                 run_scores, run_toks, bank_scores, bank_toks, bank_fin,
                 heur_unsat, rng, jnp.array(False))
        carry = jax.lax.while_loop(cond, step, carry)
        # bank is kept sorted descending by lax.top_k: slot 0 is the best
        return carry[8][:, 0]

    return run


def beam_generate(model, input_ids, attention_mask, gen_config: GenerationConfig,
                  rng: Optional[Array] = None,
                  prefill_hooks=None, intervention_locations=None):
    """HF-parity beam search (see ``_compiled_beam``); ``rng`` is only
    consumed when ``do_sample`` (beam-sample via Gumbel top-k).

    intervention_locations / prefill_hooks must already be built for the
    beam-EXPANDED batch (b*K) when interventions are used (the reference
    repeat-interleaves locations per beam, compute_metrics.py:164-166)."""
    graphdef, state = nnx.split(model)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    has_locs = intervention_locations is not None
    if prefill_hooks is not None:
        run = _compiled_beam.__wrapped__(graphdef, gen_config, False,
                                         _FreshHooks(prefill_hooks))
    else:
        run = _compiled_beam(graphdef, gen_config, has_locs)
    locs = jnp.asarray(intervention_locations) if has_locs else None
    toks = run(state, jnp.asarray(input_ids), jnp.asarray(attention_mask),
               rng, locs)
    return jnp.concatenate([jnp.asarray(input_ids), toks], axis=-1)
