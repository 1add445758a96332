"""ReFT interventions: math identities, position targeting, training."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.interventions import (
    ConsreftIntervention,
    LoreftIntervention,
    MoReIntervention,
    NoIntervention,
    ReftConfig,
    get_reft_model,
)
from sparse_matrix_fine_tuning_tpu.interventions.reft import apply_at_positions
from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.peft import trainable_filter
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model


def test_loreft_projects_to_source_in_subspace():
    iv = LoreftIntervention(16, 4, rngs=nnx.Rngs(0))
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16))
    out = iv(h)
    # in the rotated subspace, output equals the learned source exactly:
    # R^T(out) = act(W h + b)
    R = iv.rotate[...]
    src = h @ iv.w[...] + iv.b[...]
    np.testing.assert_allclose(np.asarray(out @ R), np.asarray(src),
                               rtol=1e-3, atol=1e-4)


def test_consreft_constant_subspace():
    iv = ConsreftIntervention(16, 4, rngs=nnx.Rngs(0))
    h = jax.random.normal(jax.random.PRNGKey(2), (5, 16))
    out = iv(h)
    R = iv.rotate[...]
    np.testing.assert_allclose(
        np.asarray(out @ R),
        np.broadcast_to(np.asarray(iv.source[...]), (5, 4)),
        rtol=1e-3, atol=1e-4)


def test_more_intervention_runs_and_is_orthogonal_blockwise():
    iv = MoReIntervention(32, 8, nblocks=4, rngs=nnx.Rngs(0))
    for blk in iv.rotate_layer.weight[...]:
        gram = blk @ blk.T
        np.testing.assert_allclose(np.asarray(gram), np.eye(blk.shape[0]), atol=1e-4)
    h = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 32))
    assert iv(h).shape == h.shape


def test_apply_at_positions_targets_only_listed_tokens():
    x = jnp.zeros((2, 6, 4))
    locs = jnp.array([[1, 3, -1], [0, 5, -1]])
    out = apply_at_positions(x, locs, lambda g: g + 1.0)
    out = np.asarray(out)
    assert out[0, 1].sum() == 4 and out[0, 3].sum() == 4
    assert out[1, 0].sum() == 4 and out[1, 5].sum() == 4
    # untouched positions stay zero (including the -1 padding slots)
    assert out[0, [0, 2, 4, 5]].sum() == 0
    assert out[1, [1, 2, 3, 4]].sum() == 0


def test_reft_model_end_to_end_trains():
    cfg = LlamaConfig.tiny()
    base = fresh_model(LlamaForCausalLM, cfg)
    reft = get_reft_model(base, ReftConfig(representations=[
        {"layer": 0, "component": "block_output",
         "intervention": "LoreftIntervention", "low_rank_dimension": 4},
        {"layer": 1, "component": "block_output",
         "intervention": "MoReIntervention", "low_rank_dimension": 8},
    ]), rngs=nnx.Rngs(1))
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 10), 0, cfg.vocab_size)
    locs = jnp.array([[[0, 1, 8, 9]], [[0, 1, 8, 9]]])  # (b, 1, p)
    logits = reft(ids, intervention_locations=locs)
    assert logits.shape == (2, 10, cfg.vocab_size)

    filt = trainable_filter()

    @nnx.jit
    def step(model, ids, locs):
        def loss(m):
            lg = m(ids, intervention_locations=locs)
            return m.loss(lg, ids)
        return nnx.value_and_grad(loss, argnums=nnx.DiffState(0, filt))(model)

    val, grads = step(reft, ids, locs)
    assert np.isfinite(float(val))
    # intervention params receive gradient; base params have none
    paths = ["/".join(map(str, p)) for p, g in grads.flat_state()]
    assert any("interventions" in p for p in paths)
    assert not any("embed_tokens" in p for p in paths)


def test_no_intervention_is_identity():
    cfg = LlamaConfig.tiny()
    base = fresh_model(LlamaForCausalLM, cfg)
    plain = base(jnp.ones((1, 5), jnp.int32))
    reft = get_reft_model(base, ReftConfig(representations=[
        {"layer": 0, "intervention": "Nothing"}]))
    locs = jnp.zeros((1, 1, 2), jnp.int32)
    out = reft(jnp.ones((1, 5), jnp.int32), intervention_locations=locs)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(out), rtol=1e-6)


def test_reft_generation_with_prompt_interventions():
    """Interventions applied during prefill change generations; Nothing doesn't."""
    import numpy as np
    from sparse_matrix_fine_tuning_tpu.models.generate import (
        GenerationConfig, generate)

    cfg = LlamaConfig.tiny()
    base = fresh_model(LlamaForCausalLM, cfg)
    reft = get_reft_model(base, ReftConfig(representations=[
        {"layer": 0, "intervention": "LoreftIntervention",
         "low_rank_dimension": 4}]), rngs=nnx.Rngs(1))
    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 6), 3, cfg.vocab_size)
    mask = jnp.ones_like(ids)
    gc = GenerationConfig(max_new_tokens=4, eos_token_id=None)
    plain = generate(base, ids, mask, gc)
    locs = jnp.array([[[0, 1, 4, 5]], [[0, 1, 4, 5]]])
    hooks = reft._hooks(locs)
    intervened = generate(base, ids, mask, gc, prefill_hooks=hooks)
    assert plain.shape == intervened.shape
    # Loreft is randomly initialised (not identity) => outputs change
    assert (np.asarray(plain) != np.asarray(intervened)).any()


def test_reft_eval_pipeline_with_interventions(tmp_path):
    """compute_reasoning_metrics routes intervention locations into prefill."""
    import numpy as np
    from sparse_matrix_fine_tuning_tpu.data.reasoning import (
        load_data_items, tokenize_reasoning)
    from sparse_matrix_fine_tuning_tpu.data.tokenizer import SimpleTokenizer
    from sparse_matrix_fine_tuning_tpu.evaluation import compute_reasoning_metrics

    tok = SimpleTokenizer(vocab_size=256)
    cfg = LlamaConfig.tiny()
    base = fresh_model(LlamaForCausalLM, cfg)
    reft = get_reft_model(base, ReftConfig(representations=[
        {"layer": 0, "intervention": "LoreftIntervention",
         "low_rank_dimension": 4}]), rngs=nnx.Rngs(1))
    items = load_data_items("math", "MultiArith", "nope", smoke=True, smoke_n=8)
    data = tokenize_reasoning("math", items, tok, max_length=48, split="test")
    gens, metrics = compute_reasoning_metrics(
        "math", "MultiArith", reft, tok, data, items, batch_size=4,
        greedy_decoding=True, max_new_tokens=4)
    assert "eval/MultiArith" in metrics
    assert len(gens) == 8


def test_intervention_params_checkpointed(tmp_path):
    """Intervention params are AdapterParams and land in trainable-only
    checkpoints (the reference saves an intervenable_model dir,
    reft_trainer.py:48-67)."""
    import numpy as np
    from sparse_matrix_fine_tuning_tpu.training import checkpoint as ckpt

    cfg = LlamaConfig.tiny()
    base = fresh_model(LlamaForCausalLM, cfg)
    reft = get_reft_model(base, ReftConfig(representations=[
        {"layer": 0, "intervention": "LoreftIntervention",
         "low_rank_dimension": 4}]), rngs=nnx.Rngs(1))
    filt = trainable_filter()
    state = nnx.state(reft, filt)
    paths = {"/".join(map(str, p)) for p, _ in state.flat_state()}
    assert any("interventions" in p for p in paths)
    path = ckpt.save(str(tmp_path), 1, state, {"dummy": jnp.zeros(1)})
    # perturb and restore
    orig = jax.tree.map(np.asarray, state)
    zeroed = jax.tree.map(lambda x: x * 0, state)
    nnx.update(reft, zeroed)
    restored, _, _ = ckpt.load(path, nnx.state(reft, filt), {"dummy": jnp.zeros(1)})
    nnx.update(reft, restored)
    for a, b in zip(jax.tree.leaves(orig), jax.tree.leaves(nnx.state(reft, filt))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_component_addressed_hooks():
    """Non-block-output components (pyvene's component map): interventions
    at attention_output / mlp_output / block_input apply inside the layer."""
    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 3, cfg.vocab_size)
    base = np.asarray(model(ids))
    for comp in ("attention_output", "mlp_output", "block_input"):
        out = np.asarray(model(ids, layer_hooks={(1, comp): lambda h: h * 2.0}))
        assert not np.allclose(out, base), comp
    # (layer, "block_output") is equivalent to the plain-int key
    a = np.asarray(model(ids, layer_hooks={(1, "block_output"): lambda h: h + 1}))
    b = np.asarray(model(ids, layer_hooks={1: lambda h: h + 1}))
    np.testing.assert_allclose(a, b)


def test_untied_interventions_compose_on_one_layer():
    """share_weights=False: two interventions target the SAME layer (first-n
    and last-n positions).  Both must fire -- round-2 _hooks overwrote the
    dict entry, silently dropping the first."""
    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    reps = [{"layer": 1, "component": "block_output",
             "intervention": "ConsreftIntervention", "low_rank_dimension": 2},
            {"layer": 1, "component": "block_output",
             "intervention": "ConsreftIntervention", "low_rank_dimension": 2}]
    rm = get_reft_model(model, ReftConfig(representations=reps),
                        rngs=nnx.Rngs(1))
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 3, cfg.vocab_size)
    # intervention 0 edits positions {0,1}; intervention 1 edits {6,7}
    locs = np.array([[[0, 1], [6, 7]]] * 2, np.int32)
    out_both = np.asarray(rm(ids, intervention_locations=locs))
    # zeroing one intervention's positions (-1 pads are no-ops) must change
    # the output if that intervention was actually applied
    locs_first_only = np.array([[[0, 1], [-1, -1]]] * 2, np.int32)
    locs_last_only = np.array([[[-1, -1], [6, 7]]] * 2, np.int32)
    out_first = np.asarray(rm(ids, intervention_locations=locs_first_only))
    out_last = np.asarray(rm(ids, intervention_locations=locs_last_only))
    assert not np.allclose(out_both, out_first), "second intervention dropped"
    assert not np.allclose(out_both, out_last), "first intervention dropped"
    # collect_activations must gather BOTH same-site interventions too
    collected = rm.collect_activations(ids, locs)
    assert set(collected.keys()) == {0, 1}
    assert not np.allclose(np.asarray(collected[0]), np.asarray(collected[1]))


def test_swap_forward_vanilla_interchange():
    """pyvene source->base: swapping a SOURCE example's activations into the
    base forward.  Identical source == no-op; different source changes the
    output only through the intervened positions."""
    from sparse_matrix_fine_tuning_tpu.interventions.reft import (
        ReftConfig, ReftModel)
    cfg = LlamaConfig.tiny()
    base_model = fresh_model(LlamaForCausalLM, cfg)
    rm = ReftModel(base_model, ReftConfig(representations=[
        {"layer": 0, "component": "block_output",
         "intervention": "VanillaIntervention"}]), rngs=nnx.Rngs(1))
    key = jax.random.PRNGKey(0)
    base_ids = jax.random.randint(key, (2, 8), 3, cfg.vocab_size)
    src_ids = jax.random.randint(jax.random.PRNGKey(9), (2, 8), 3, cfg.vocab_size)
    locs = jnp.broadcast_to(jnp.arange(3)[None, None, :], (2, 1, 3))

    plain = np.asarray(base_model(base_ids))
    same = np.asarray(rm.swap_forward(base_ids, base_ids,
                                      base_locations=locs, source_locations=locs))
    np.testing.assert_allclose(same, plain, rtol=1e-5, atol=1e-5)

    swapped = np.asarray(rm.swap_forward(base_ids, src_ids,
                                         base_locations=locs, source_locations=locs))
    assert not np.allclose(swapped, plain)
    # causality: tokens before the first intervened position are unaffected
    # (positions 0..2 intervened at layer-1 output; logits at position 0..1
    # depend only on positions <= themselves pre-layer-2... position 7 must
    # definitely change)
    assert not np.allclose(swapped[:, -1], plain[:, -1])


def test_collect_activations_matches_hidden():
    from sparse_matrix_fine_tuning_tpu.interventions.reft import (
        ReftConfig, ReftModel)
    cfg = LlamaConfig.tiny()
    base_model = fresh_model(LlamaForCausalLM, cfg)
    rm = ReftModel(base_model, ReftConfig(representations=[
        {"layer": 0, "component": "block_output",
         "intervention": "CollectIntervention"}]), rngs=nnx.Rngs(1))
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 3, cfg.vocab_size)
    locs = jnp.array([[[1, 3, -1]]])
    got = rm.collect_activations(ids, locs)
    assert 0 in got and got[0].shape == (1, 3, cfg.hidden_size)


def test_intervention_save_load_roundtrip(tmp_path):
    """Intervention state save/load dir (reference
    intervenable_base.py:379-570)."""
    from sparse_matrix_fine_tuning_tpu.interventions.reft import (
        ReftConfig, ReftModel)
    cfg = LlamaConfig.tiny()
    reps = [{"layer": 0, "component": "block_output",
             "intervention": "LoreftIntervention", "low_rank_dimension": 4}]
    rm = ReftModel(fresh_model(LlamaForCausalLM, cfg),
                   ReftConfig(representations=reps), rngs=nnx.Rngs(1))
    rm.save_interventions(str(tmp_path))
    import os
    assert os.path.exists(os.path.join(str(tmp_path), "interventions.npz"))
    assert os.path.exists(os.path.join(str(tmp_path), "intervenable_config.json"))

    rm2 = ReftModel(fresh_model(LlamaForCausalLM, cfg),
                    ReftConfig(representations=reps), rngs=nnx.Rngs(7))
    before = np.asarray(rm2.interventions[0].rotate[...])
    rm2.load_interventions(str(tmp_path))
    after = np.asarray(rm2.interventions[0].rotate[...])
    assert not np.allclose(before, after)
    np.testing.assert_allclose(after, np.asarray(rm.interventions[0].rotate[...]))


def test_skip_intervention_uses_same_example_layer_input():
    """pyvene Skip semantics (interventions.py:166-186): the hooked block's
    output is replaced by the SAME example's input to that block.  Expected
    value constructed with a Vanilla interchange whose source is the
    previous block's output collected from the same example."""
    from sparse_matrix_fine_tuning_tpu.interventions.reft import (
        ReftModel, SkipIntervention, VanillaIntervention)

    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 3, cfg.vocab_size)
    locs = jnp.asarray(np.array([[[0, 1, 2]], [[1, 2, 3]]]))  # (b, 1, p)
    L = 1

    skip = ReftModel(model, ReftConfig(representations=[
        {"layer": L, "intervention": SkipIntervention}]))
    got = skip.model(ids, layer_hooks=skip._hooks(locs))

    vanilla = ReftModel(model, ReftConfig(representations=[
        {"layer": L, "intervention": VanillaIntervention}]))
    # collect at layer L-1 to get block L's input
    collector = ReftModel(model, ReftConfig(representations=[
        {"layer": L - 1, "intervention": "CollectIntervention"}]))
    src = collector.collect_activations(ids, locs)
    want = vanilla.model(ids, layer_hooks=vanilla._hooks(locs, sources=src))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_skip_capture_sees_edits_regardless_of_listing_order():
    """A skip at layer L captures block L-1's output AFTER every edit
    registered at that site (pyvene: the block's real input), even when the
    editing intervention is listed after the skip in the representations
    list -- the result must be identical under both orderings."""
    from sparse_matrix_fine_tuning_tpu.interventions.reft import ReftModel

    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 3, cfg.vocab_size)
    L = 2
    skip_rep = {"layer": L, "intervention": "SkipIntervention"}
    edit_rep = {"layer": L - 1, "intervention": "ZeroIntervention"}
    locs2 = jnp.asarray(np.array([[[0, 1], [0, 1]], [[1, 2], [1, 2]]]))

    outs = []
    for reps in ([skip_rep, edit_rep], [edit_rep, skip_rep]):
        rm = ReftModel(model, ReftConfig(representations=reps))
        outs.append(np.asarray(rm.model(ids, layer_hooks=rm._hooks(locs2))))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)

    # and the capture genuinely includes the edit: skipping over an edited
    # block input differs from skipping over the unedited one
    rm_noedit = ReftModel(model, ReftConfig(representations=[skip_rep]))
    locs1 = locs2[:, :1]
    base = np.asarray(rm_noedit.model(
        ids, layer_hooks=rm_noedit._hooks(locs1)))
    assert not np.allclose(outs[0], base)


def test_pca_intervention_constructs_through_registry():
    from sparse_matrix_fine_tuning_tpu.interventions.reft import ReftModel

    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    d = cfg.hidden_size
    q, _ = np.linalg.qr(np.random.default_rng(0).normal(size=(d, d)))
    reft = ReftModel(model, ReftConfig(representations=[{
        "layer": 1, "intervention": "PCARotatedSpaceIntervention",
        "pca_components": q.T.astype(np.float32),
        "pca_mean": np.zeros(d, np.float32),
        "pca_std": np.ones(d, np.float32),
    }]))
    assert reft.interventions[0].components[...].shape == (d, d)

    import pytest
    with pytest.raises(ValueError, match="pca_components"):
        ReftModel(model, ReftConfig(representations=[
            {"layer": 1, "intervention": "PCARotatedSpaceIntervention"}]))


def test_noreft_dropout_active_in_training_mode():
    from sparse_matrix_fine_tuning_tpu.interventions.reft import (
        NoreftIntervention)

    iv = NoreftIntervention(16, 4, dropout=0.5, rngs=nnx.Rngs(0))
    h = jax.random.normal(jax.random.PRNGKey(4), (3, 16))
    eval_out = np.asarray(iv(h))
    iv.dropout.deterministic = False  # what model.train() flips
    train_outs = {np.asarray(iv(h)).tobytes() for _ in range(4)}
    assert len(train_outs) > 1  # random masks vary per call
    iv.dropout.deterministic = True
    np.testing.assert_array_equal(np.asarray(iv(h)), eval_out)


def test_swap_forward_subspaces_restrict_the_interchange():
    """pyvene forward(subspaces=...): a Vanilla interchange restricted to a
    coordinate subset must (a) equal the full swap when all dims are listed,
    (b) differ from both no-swap and full-swap on a strict subset, and
    (c) honour per-intervention nested lists and partition ids."""
    from sparse_matrix_fine_tuning_tpu.interventions.reft import (
        ReftConfig, ReftModel)
    cfg = LlamaConfig.tiny()
    d = cfg.hidden_size
    base_model = fresh_model(LlamaForCausalLM, cfg)
    rm = ReftModel(base_model, ReftConfig(representations=[
        {"layer": 0, "component": "block_output",
         "intervention": "VanillaIntervention"}]), rngs=nnx.Rngs(1))
    base_ids = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 3,
                                  cfg.vocab_size)
    src_ids = jax.random.randint(jax.random.PRNGKey(9), (2, 8), 3,
                                 cfg.vocab_size)
    locs = jnp.broadcast_to(jnp.arange(3)[None, None, :], (2, 1, 3))
    kw = dict(base_locations=locs, source_locations=locs)

    plain = np.asarray(base_model(base_ids))
    full = np.asarray(rm.swap_forward(base_ids, src_ids, **kw))
    all_dims = np.asarray(rm.swap_forward(base_ids, src_ids,
                                          subspaces=list(range(d)), **kw))
    np.testing.assert_allclose(all_dims, full, rtol=1e-5, atol=1e-5)

    half = np.asarray(rm.swap_forward(base_ids, src_ids,
                                      subspaces=list(range(d // 2)), **kw))
    assert not np.allclose(half, plain) and not np.allclose(half, full)

    # nested per-intervention list resolves to the same selection
    nested = np.asarray(rm.swap_forward(base_ids, src_ids,
                                        subspaces=[list(range(d // 2))], **kw))
    np.testing.assert_allclose(nested, half, rtol=1e-5, atol=1e-5)

    # empty selection swaps nothing
    none_sel = np.asarray(rm.swap_forward(base_ids, src_ids, subspaces=[[]],
                                          **kw))
    np.testing.assert_allclose(none_sel, plain, rtol=1e-5, atol=1e-5)

    # partition ids: partition 0 = first half of the dims
    rm_part = ReftModel(base_model, ReftConfig(representations=[
        {"layer": 0, "component": "block_output",
         "intervention": "VanillaIntervention",
         "subspace_partition": [list(range(d // 2)),
                                list(range(d // 2, d))]}]), rngs=nnx.Rngs(1))
    part = np.asarray(rm_part.swap_forward(base_ids, src_ids, subspaces=[0],
                                           **kw))
    np.testing.assert_allclose(part, half, rtol=1e-5, atol=1e-5)


def test_subspaces_unsupported_intervention_raises():
    import pytest

    from sparse_matrix_fine_tuning_tpu.interventions.reft import (
        ReftConfig, ReftModel)
    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    rm = ReftModel(model, ReftConfig(representations=[
        {"layer": 0, "intervention": "LoreftIntervention",
         "low_rank_dimension": 2}]), rngs=nnx.Rngs(1))
    ids = jax.random.randint(jax.random.PRNGKey(0), (1, 8), 3, cfg.vocab_size)
    locs = jnp.zeros((1, 1, 2), jnp.int32)
    with pytest.raises(ValueError, match="does not support subspaces"):
        rm(ids, intervention_locations=locs, subspaces=[0, 1])

def test_reft_on_sibling_families():
    """The in-jit hook engine is component-addressed on the shared decoder
    stack, so the sibling families (models/config.py) compose with ReFT
    unchanged -- intervened forward differs from base, shape preserved."""
    for kw in (dict(sliding_window=4),                       # mistral
               dict(head_dim=16, num_key_value_heads=1,      # gemma
                    mlp_activation="gelu_tanh", rmsnorm_unit_offset=True,
                    scale_embeddings=True, tie_word_embeddings=True),
               dict(attention_qkv_bias=True)):               # qwen2
        cfg = LlamaConfig.tiny(**kw)
        base = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
        reft = get_reft_model(base, ReftConfig(representations=[
            {"layer": 1, "component": "block_output",
             "intervention": "MoReIntervention", "low_rank_dimension": 8},
        ]), rngs=nnx.Rngs(1))
        ids = jax.random.randint(jax.random.PRNGKey(4), (2, 10), 0,
                                 cfg.vocab_size)
        locs = jnp.array([[[0, 1, 8, 9]], [[0, 1, 8, 9]]])
        logits = reft(ids, intervention_locations=locs)
        assert logits.shape == (2, 10, cfg.vocab_size)
        assert bool(jnp.isfinite(logits).all())
