"""CLIP re-ranking parity: the flax CLIP + load_torch_clip must reproduce a
randomly-initialized torch CLIP (architecture + state_dict names of the
official `clip` package) on image features, text features, and the final
candidate ranking (`scripts/sampling_demo.ipynb` clip_reranking cell)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

from hqtransformer_tpu.evaluation.clip_rerank import (CLIP, CLIPConfig,
                                                      clip_rerank,
                                                      load_torch_clip,
                                                      preprocess)
from torch_clip_stub import TorchCLIP

CFG = CLIPConfig(image_resolution=32, vision_width=64, vision_layers=2,
                 vision_heads=4, patch_size=16, embed_dim=32,
                 vocab_size=100, context_length=16, text_width=48,
                 text_layers=2, text_heads=4)


def _models():
    torch.manual_seed(0)
    tm = TorchCLIP(embed_dim=CFG.embed_dim,
                   image_resolution=CFG.image_resolution,
                   vision_layers=CFG.vision_layers,
                   vision_width=CFG.vision_width,
                   vision_heads=CFG.vision_heads,
                   vision_patch_size=CFG.patch_size,
                   context_length=CFG.context_length,
                   vocab_size=CFG.vocab_size,
                   transformer_width=CFG.text_width,
                   transformer_heads=CFG.text_heads,
                   transformer_layers=CFG.text_layers).eval()
    jm = CLIP(CFG)
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, CFG.context_length), jnp.int32))
    variables = load_torch_clip(variables, tm.state_dict())
    return tm, jm, variables


def test_clip_features_match_torch():
    tm, jm, variables = _models()
    rng = np.random.RandomState(1)
    imgs = rng.rand(3, 32, 32, 3).astype(np.float32)
    toks = rng.randint(1, CFG.vocab_size, (3, CFG.context_length))
    toks[:, -1] = CFG.vocab_size - 1  # eot = argmax position

    with torch.no_grad():
        t_img = tm.encode_image(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
        t_txt = tm.encode_text(torch.from_numpy(toks)).numpy()
    j_img = np.asarray(jm.apply(variables, jnp.asarray(imgs),
                                method=CLIP.encode_image))
    j_txt = np.asarray(jm.apply(variables, jnp.asarray(toks),
                                method=CLIP.encode_text))
    np.testing.assert_allclose(j_img, t_img, atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(j_txt, t_txt, atol=2e-5, rtol=2e-4)


def test_rerank_matches_torch_cosine_ranking():
    tm, jm, variables = _models()
    rng = np.random.RandomState(2)
    pixels = rng.rand(6, 32, 32, 3).astype(np.float32)
    toks = rng.randint(1, CFG.vocab_size, (1, CFG.context_length))
    toks[:, -1] = CFG.vocab_size - 1

    pre = preprocess(pixels, CFG.image_resolution)
    with torch.no_grad():
        t_img = tm.encode_image(
            torch.from_numpy(pre.transpose(0, 3, 1, 2)))
        t_txt = tm.encode_text(torch.from_numpy(toks))
        t_scores = torch.nn.functional.cosine_similarity(
            t_img, t_txt).numpy()
    t_ranked = np.argsort(t_scores)[::-1]

    ranked, scores = clip_rerank(jm, variables, pixels, toks)
    np.testing.assert_array_equal(ranked, t_ranked)
    np.testing.assert_allclose(scores, t_scores[t_ranked], atol=1e-5)
