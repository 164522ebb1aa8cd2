"""Two-stage model wrapper: frozen stage-1 HQ-VAE + trainable stage-2
transformer, with checkpoint loading and end-to-end pixel sampling.

Equivalent of `ImageGPT2` (`hqvae/models/__init__.py:92-474`) minus the
Lightning scaffolding: stage-1 and stage-2 are independent flax modules with
separate variable trees, composed by pure functions (code extraction ->
stage-2 forward; sampler -> decode_code), all jit-compiled together.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import (Stage2Hparams, TwoStageConfig, parse_model_type)
from ..checkpoint import convert_torch_state_dict, load_torch_checkpoint
from ..sampling.engine import SamplingParams, make_hierarchical_sampler
from .stage1.generator import build_generator
from .stage1.layers import int8_decode_scope
from .stage2.hierarchical import HierarchicalGPT, cells_to_raster
from .stage2.transformer import IGPT, Transformer1d


def _decode_chunked(dec1, arrays, chunk: int):
    """Run the per-chunk decode `dec1(*arrays_slice)` over `chunk`-sample
    slices of the leading axis, padding non-divisible batches and dropping
    the padded outputs. HBM protection: the conv decoder's 256^2 activations
    at large batch exceed HBM unchunked (16 MB/sample at the flagship
    config), while the AR loop itself scales past batch 512. Also the
    single entry point into the serving-only `int8_decode_scope`."""
    B = arrays[0].shape[0]
    chunk = min(chunk, B)
    with int8_decode_scope():
        if B <= chunk:
            return dec1(*arrays)
        n = -(-B // chunk)
        pad = n * chunk - B
        padded = [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                  for a in arrays]
        out = jax.lax.map(
            lambda t: dec1(*t),
            tuple(a.reshape(n, chunk, *a.shape[1:]) for a in padded))
        return out.reshape(n * chunk, *out.shape[2:])[:B]


def build_stage2(config: TwoStageConfig, dtype=jnp.float32,
                 remat: bool = False):
    """Stage-2 dispatch by `stage2.type` (`models/__init__.py:114-147`).
    `remat` enables gradient rematerialization on the transformer blocks
    for training (main_stage2.py --remat); checkpoints are identical."""
    s2 = config.stage2
    spec = parse_model_type(s2.type)
    if spec.family == 'top':
        return IGPT(vocab_size_img=s2.vocab_size_img,
                    use_cls_cond=bool(s2.use_cls_cond), hparams=s2.hparams,
                    dtype=dtype)
    if spec.family == 'bottom':
        return Transformer1d(vocab_size_txt=s2.vocab_size_img,
                             vocab_size_img=s2.vocab_size_img,
                             hparams=s2.hparams, dtype=dtype)
    if spec.family == 'hq-transformer':
        return HierarchicalGPT(vocab_size_top=s2.vocab_size_img,
                               vocab_size_bot=s2.vocab_size_img,
                               vocab_size_txt=s2.vocab_size_txt,
                               ratio_bot2top=s2.ratio_bot2top,
                               use_cls_cond=bool(s2.use_cls_cond),
                               use_txt_cond=bool(s2.use_txt_cond),
                               model_type=spec, hparams=s2.hparams,
                               hparams_dec=s2.hparams_dec, dtype=dtype,
                               remat=remat)
    if spec.family == 'multilevel-hq':
        from .stage2.multilevel import MultiLevelHQTransformer
        return MultiLevelHQTransformer(
            vocab_sizes=tuple(s2.vocab_sizes_img),
            vocab_size_txt=s2.vocab_size_txt,
            decoding_type=s2.decoding_type or 'tree',
            use_cls_cond=bool(s2.use_cls_cond),
            use_txt_cond=bool(s2.use_txt_cond),
            hparams=s2.hparams, hparams_dec=s2.hparams_dec, dtype=dtype)
    raise ValueError(s2.type)


def serving_bf16_params(variables):
    """The bf16 serving convention shared by every throughput harness
    (bench.py, measure_throughput.py, the ablation/divergence scripts):
    store matrix (ndim >= 2) f32 params as bf16. Halves param HBM and
    removes XLA's hoisted f32->bf16 copy temps; 1-D scales/biases and
    non-f32 leaves (e.g. int EMA counts) stay as they are. Numerics: one
    extra bf16 rounding on weights consumed through dtype promotion — same
    class as the measured bf16 divergence (README "RNG discipline")."""
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x, variables)


# int8 serving-scale artifact: the calibration collections produced by
# TwoStageModel.calibrate_{kv_scales,int8_decode,stage2_int8}, saved as a
# standalone file so calibration (an offline PTQ step) and serving can run
# in SEPARATE processes. The serving process then compiles only its
# measurement/serving programs — no calibration executables or their
# arenas ever touch the device (the in-process sequence RESOURCE_EXHAUSTED
# the 16 GB chip at every batch size; see docs/serving.md). The reference
# has no analogue (its serving quantization is dynamic fp16 autocast,
# `hierarchical_ar.py:445`).
_SCALE_COLLECTIONS = (('stage1', 'act_scales'), ('stage2', 'kv_scales'),
                      ('stage2', 'act_scales'))


def save_serving_scales(variables: Dict, path: str) -> None:
    """Write every calibration collection present in `variables` to `path`
    (pickle of a {(stage, collection): numpy tree} dict)."""
    import pickle

    import numpy as np
    scales = {f'{s}/{c}': jax.tree.map(np.asarray, variables[s][c])
              for s, c in _SCALE_COLLECTIONS
              if c in variables.get(s, {})}
    with open(path, 'wb') as f:
        pickle.dump(scales, f)


def load_serving_scales(variables: Dict, path: str) -> Dict:
    """Merge a `save_serving_scales` artifact back into `variables`.
    Internal trusted artifact (pickle): only load files you wrote."""
    import pickle
    with open(path, 'rb') as f:
        scales = pickle.load(f)
    out = dict(variables)
    for key, tree in scales.items():
        stage, coll = key.split('/', 1)
        out[stage] = {**out[stage], coll: tree}
    return out


class TwoStageModel:
    """Container pairing the frozen stage-1 generator with a stage-2 AR
    model. Not a flax module: holds two module defs and composes their
    `apply` calls in jitted pure functions."""

    def __init__(self, config: TwoStageConfig, dtype=jnp.float32,
                 remat: bool = False):
        self.config = config
        self.dtype = dtype
        self.stage1 = build_generator(config.stage1, dtype=dtype)
        self.stage2 = build_stage2(config, dtype=dtype, remat=remat)
        # spatial length of the stage-2 loop: top codes of the stage-1
        # latent. 2-level: latent_dim / sqrt(ratio); N-level:
        # latent_dim / 2^(levels-1).
        s1 = config.stage1
        self.latent_dim = s1.hparams.attn_resolutions[0]
        self.ratio = config.stage2.ratio_bot2top or 4
        self.cell_win = int(math.isqrt(self.ratio))
        spec = parse_model_type(config.stage2.type)
        if spec.family == 'multilevel-hq':
            self.code_levels = len(config.stage2.vocab_sizes_img)
            self.top_res = self.latent_dim // (2 ** (self.code_levels - 1))
        else:
            self.code_levels = 2
            self.top_res = self.latent_dim // self.cell_win

    # ------------------------------------------------------------ variables
    def init_variables(self, key: jax.Array,
                       image_resolution: Optional[int] = None) -> Dict:
        k1, k2 = jax.random.split(key)
        res = image_resolution or self.config.dataset.image_resolution
        x = jnp.zeros((1, res, res, 3), self.dtype)
        v1 = self.stage1.init(k1, x)
        B, Ttop = 1, self.top_res * self.top_res
        codes_t = jnp.zeros((B, Ttop), jnp.int32)
        if isinstance(self.stage2, HierarchicalGPT):
            codes_b = jnp.zeros((B, Ttop * self.ratio), jnp.int32)
            labels = self._dummy_labels(B)
            v2 = self.stage2.init(k2, codes_t, codes_b, labels)
        elif isinstance(self.stage2, IGPT):
            v2 = self.stage2.init(k2, codes_t, self._dummy_labels(B))
        elif isinstance(self.stage2, Transformer1d):
            texts = jnp.zeros((B, self.config.stage2.hparams.ctx_len_txt),
                              jnp.int32)
            v2 = self.stage2.init(k2, codes_t, texts)
        else:
            from .stage2.multilevel import MultiLevelHQTransformer
            codes = [codes_t]
            win = 1
            for _ in range(len(self.config.stage2.vocab_sizes_img) - 1):
                win *= 2
                codes.append(jnp.zeros((B, Ttop * win * win), jnp.int32))
            v2 = self.stage2.init(k2, codes, self._dummy_labels(B))
        return {'stage1': v1, 'stage2': v2}

    def _dummy_labels(self, B: int):
        if self.config.stage2.use_txt_cond:
            return jnp.zeros((B, self.config.stage2.hparams.ctx_len_txt),
                             jnp.int32)
        return jnp.zeros((B,), jnp.int32)

    # ----------------------------------------------------------- checkpoint
    def load_reference_checkpoint(self, path_or_sd, variables: Dict) -> Dict:
        """Load a reference Lightning ckpt with 'stage1.*' / 'stage2.*' keys
        (SURVEY.md §5 layout) into the variable trees."""
        sd = (load_torch_checkpoint(path_or_sd)
              if isinstance(path_or_sd, str) else path_or_sd)
        sd1 = {k[len('stage1.'):]: v for k, v in sd.items()
               if k.startswith('stage1.')}
        sd2 = {k[len('stage2.'):]: v for k, v in sd.items()
               if k.startswith('stage2.')}
        return {'stage1': convert_torch_state_dict(sd1, variables['stage1']),
                'stage2': convert_torch_state_dict(sd2, variables['stage2'])}

    # ------------------------------------------------------------- forward
    def extract_codes(self, variables, images,
                      temp_soft_labels: Optional[float] = None,
                      rng: Optional[jax.Array] = None):
        """Frozen stage-1 code extraction (`models/__init__.py:245-255`).
        Returns ((codes_t [B, Ttop], codes_b [B, Tbot]), (soft_t, soft_b))."""
        B = images.shape[0]
        if temp_soft_labels is not None:
            (ct, cb), (st, sb) = self.stage1.apply(
                variables['stage1'], images, temp_soft_labels,
                method=type(self.stage1).get_soft_codes)
            return ((jax.lax.stop_gradient(ct.reshape(B, -1)),
                     jax.lax.stop_gradient(cb.reshape(B, -1))),
                    (jax.lax.stop_gradient(st.reshape(B, -1, st.shape[-1])),
                     jax.lax.stop_gradient(sb.reshape(B, -1, sb.shape[-1]))))
        ct, cb = self.stage1.apply(variables['stage1'], images,
                                   method=type(self.stage1).get_codes)
        ct = jax.lax.stop_gradient(ct.reshape(B, -1))
        cb = jax.lax.stop_gradient(cb.reshape(B, -1))
        return (ct, cb), (None, None)

    def forward(self, variables, images, labels=None):
        """Training forward (`models/__init__.py:237-271`): stage-1 codes
        under stop_gradient, stage-2 logits."""
        (ct, cb), softs = self.extract_codes(variables, images)
        logits = self.stage2.apply(variables['stage2'], ct, cb, labels)
        return logits, (ct, cb), softs

    # ----------------------------------------------------- int8 calibration
    def calibrate_int8_decode(self, variables: Dict, *decode_args,
                              chunk: int = 128) -> Dict:
        """Static (calibrated) quantization scales for the opt-in A8W8
        serving decode: runs `decode_code` on a representative code batch,
        recording every conv's input absmax, and returns `variables` with
        the stage-1 tree extended by the 'act_scales' collection. With
        scales present, QuantizableConv skips the per-call dynamic max
        reduction — the overhead that limited dynamic A8W8 to ~1.07x
        end-to-end. Standard post-training quantization: activations
        outside the calibrated range saturate at +-127. Call repeatedly
        and merge with `jax.tree.map(jnp.maximum, a, b)` to widen ranges
        over several batches. No reference analogue (its decode runs fp16
        autocast, `hierarchical_ar.py:445`).

        The decode runs in `chunk`-sample slices with a FORCED fetch per
        slice, chunk scales merged by `maximum` (exact: scale is monotone
        in absmax). Unchunked, a 256-sample calibration decode holds ~8 GB
        of 256^2 conv activations — the RESOURCE_EXHAUSTED behind the int8
        family-row calibration on the 16 GB chip; the serving decode
        itself chunks at 128 for the same reason (_decode_chunked). The
        per-slice fetch also keeps this backend's ASYNC dispatch from
        queueing every slice's full decode before any buffer releases."""
        from .stage1.layers import (int8_calibration_scope,
                                    int8_scales_from_calib)
        B = jax.tree.leaves(list(decode_args))[0].shape[0]
        scales = None
        for i in range(0, B, chunk):
            sl = jax.tree.map(lambda a: a[i:i + chunk], list(decode_args))
            with int8_calibration_scope():
                _, col = self.stage1.apply(
                    variables['stage1'], *sl,
                    method=type(self.stage1).decode_code,
                    mutable=['int8_calib'])
            s = int8_scales_from_calib(col['int8_calib'])
            # scalar fetch: block_until_ready returns early on tunneled
            # backends (axon), only a host fetch guarantees completion
            float(jnp.sum(jax.tree.leaves(s)[0].astype(jnp.float32)))
            scales = s if scales is None else jax.tree.map(jnp.maximum,
                                                           scales, s)
        return {**variables,
                'stage1': {**variables['stage1'], 'act_scales': scales}}

    def calibrate_stage2_int8(self, variables: Dict, *forward_args) -> Dict:
        """Static activation scales for the opt-in A8W8 depth-chain gemms
        (HQT_INT8_STAGE2=1; see stage2/layers.QuantizableDense): run the
        stage-2 training forward — the depth blocks see the same
        activations there as in the cached decode — on representative
        teacher-forced codes, recording each Dense input's absmax, and
        return `variables` with stage2 extended by 'act_scales'. Same PTQ
        recipe as calibrate_int8_decode; widen over several batches with
        jax.tree.map(jnp.maximum, ...).

        `forward_args` are the stage-2 training-forward arguments:
        (codes_t, codes_b, labels) for the 2-level HierarchicalGPT,
        (codes_list, labels) for the 3-level MultiLevelHQTransformer."""
        from .stage1.layers import (int8_calibration_scope,
                                    int8_scales_from_calib)
        with int8_calibration_scope():
            _, col = self.stage2.apply(variables['stage2'], *forward_args,
                                       mutable=['int8_calib'])
        scales = int8_scales_from_calib(col['int8_calib'])
        # force execution NOW (scalar fetch; see calibrate_int8_decode):
        # async dispatch otherwise stacks this training forward's full
        # per-level logits on top of the next stage's programs
        float(jnp.sum(jax.tree.leaves(scales)[0].astype(jnp.float32)))
        return {**variables,
                'stage2': {**variables['stage2'], 'act_scales': scales}}

    def calibrate_kv_scales(self, variables: Dict, key, labels,
                            params: SamplingParams = SamplingParams(),
                            max_seq_len: Optional[int] = None,
                            margin: float = 1.0) -> Dict:
        """Per-channel scales for the int8 KV serving cache: runs one full
        (non-quantized) sampling pass on a representative batch, reduces the
        final KV caches to per-layer-per-channel absmax, and returns
        `variables` with the stage-2 tree extended by the 'kv_scales'
        collection ({'blocks_<l>': {'attn': {'k': [D], 'v': [D]}}}).

        With scales present, samplers built with cache_dtype=jnp.int8 store
        the spatial KV cache in int8 — halving the attention DMA floor —
        with all dequant folded outside the kernel (K's scales into q, V's
        into the attention output; see layers._PackedStepMixin). Standard
        post-training quantization: K/V values outside the calibrated range
        saturate. Call on more batches and merge with
        jax.tree.map(jnp.maximum, ...) to widen. No reference analogue (its
        sampling attention runs fp16 autocast, `hierarchical_ar.py:445`)."""
        Ttop = max_seq_len or self.top_res * self.top_res
        if isinstance(self.stage2, HierarchicalGPT):
            sampler = make_hierarchical_sampler(self.stage2, Ttop, params,
                                                _return_caches=True)
        else:
            from ..sampling.engine import make_multilevel_sampler
            from .stage2.multilevel import MultiLevelHQTransformer
            assert isinstance(self.stage2, MultiLevelHQTransformer)
            sampler = make_multilevel_sampler(self.stage2, Ttop,
                                              _return_caches=True)
        _, (kc, vc) = sampler(variables['stage2'], key, labels)

        def channel_absmax(c):
            if c.ndim == 4:      # packed [L, T, B, D]
                m = jnp.max(jnp.abs(c.astype(jnp.float32)), axis=(1, 2))
            else:                # einsum [L, B, nh, T, hd]
                L, B, nh, T, hd = c.shape
                m = jnp.max(jnp.abs(c.astype(jnp.float32)),
                            axis=(1, 3)).reshape(L, nh * hd)
            return jnp.maximum(m, 1e-6) / 127.0 * margin   # [L, D]

        ks, vs = channel_absmax(kc), channel_absmax(vc)
        # force execution NOW (scalar fetch; see calibrate_int8_decode):
        # releases the full returned KV caches before the caller queues
        # the next calibration program on this async-dispatch backend
        float(jnp.sum(ks[0, :1]) + jnp.sum(vs[0, :1]))
        n_layers = self.stage2.hparams.n_layers
        scales = {f'blocks_{i}': {'attn': {'k': ks[i], 'v': vs[i]}}
                  for i in range(n_layers)}
        return {**variables,
                'stage2': {**variables['stage2'], 'kv_scales': scales}}

    # ------------------------------------------------------------- sampling
    def make_pixel_sampler(self, max_seq_len: Optional[int] = None,
                           params: SamplingParams = SamplingParams(),
                           cache_dtype=None, decode_chunk: int = 128,
                           attention: str = 'auto'):
        """Jitted end-to-end sampler: labels -> pixels in [0, 1].

        Fuses the AR loop and the stage-1 `decode_code` into one XLA program
        (the reference splits them and chunks decode per-sample,
        `sampling_hqmodel.py:188-199`). The conv decoder runs in chunks of
        `decode_chunk` samples (its 256^2 activations at large batch would
        exceed HBM; the AR loop itself scales past batch 512).
        """
        assert isinstance(self.stage2, HierarchicalGPT)
        Ttop = max_seq_len or self.top_res * self.top_res
        sampler = make_hierarchical_sampler(self.stage2, Ttop, params,
                                            cache_dtype=cache_dtype,
                                            attention=attention)
        top_res = int(math.isqrt(Ttop))

        def decode(variables, ct, cb):
            pixels = self.stage1.apply(variables['stage1'], ct, cb,
                                       method=type(self.stage1).decode_code)
            return jnp.clip(pixels * 0.5 + 0.5, 0.0, 1.0)

        def sample_pixels(variables, key, labels):
            codes_t, codes_b = sampler(variables['stage2'], key, labels)
            ct = codes_t.reshape(-1, top_res, top_res)
            cb_raster = cells_to_raster(codes_b, top_res, self.cell_win)
            cb = cb_raster.reshape(-1, top_res * self.cell_win,
                                   top_res * self.cell_win)
            pixels = _decode_chunked(
                lambda a, b: decode(variables, a, b), [ct, cb], decode_chunk)
            return pixels, (codes_t, codes_b)

        return jax.jit(sample_pixels)

    def make_pipelined_sampler(self, max_seq_len: Optional[int] = None,
                               params: SamplingParams = SamplingParams(),
                               cache_dtype=None, decode_chunk: int = 128,
                               n_segments: int = 2,
                               attention: str = 'auto'):
        """Software-pipelined sampler for steady-state throughput:
        fn(variables, key, labels, prev_codes) -> (codes, pixels) where
        `pixels` decodes PREV_CODES (the previous batch) while the AR loop
        samples the current batch — one program per batch, every call
        emitting a full batch of finished samples. Pass prev_codes=None on
        the first call to decode the current batch instead (pipeline fill).
        """
        assert isinstance(self.stage2, HierarchicalGPT)
        Ttop = max_seq_len or self.top_res * self.top_res
        sampler = make_hierarchical_sampler(self.stage2, Ttop, params,
                                            cache_dtype=cache_dtype,
                                            n_segments=n_segments,
                                            attention=attention)
        top_res = int(math.isqrt(Ttop))

        def decode(variables, codes_t, codes_b):
            ct = codes_t.reshape(-1, top_res, top_res)
            cb = cells_to_raster(codes_b, top_res, self.cell_win).reshape(
                -1, top_res * self.cell_win, top_res * self.cell_win)

            def dec1(ct, cb):
                px = self.stage1.apply(variables['stage1'], ct, cb,
                                       method=type(self.stage1).decode_code)
                return jnp.clip(px * 0.5 + 0.5, 0.0, 1.0)

            return _decode_chunked(dec1, [ct, cb], decode_chunk)

        @jax.jit
        def step_pipelined(variables, key, labels, prev_codes):
            codes = sampler(variables['stage2'], key, labels)
            pixels = decode(variables, *prev_codes)
            return codes, pixels

        @jax.jit
        def step_fill(variables, key, labels):
            codes = sampler(variables['stage2'], key, labels)
            pixels = decode(variables, *codes)
            return codes, pixels

        def step(variables, key, labels, prev_codes=None):
            if prev_codes is None:
                return step_fill(variables, key, labels)
            return step_pipelined(variables, key, labels, prev_codes)

        return step

    def make_pixel_sampler_igpt(self, max_seq_len: Optional[int] = None,
                                top_k: Optional[int] = 256,
                                top_p: Optional[float] = None,
                                temperature: float = 1.0,
                                cache_dtype=None):
        """Jitted sampler for the flat 'top' baseline: labels -> pixels via
        top-only decode_code (the legacy `ImageGPT2.sample`,
        `models/__init__.py:207-235`)."""
        from ..sampling.engine import make_igpt_sampler
        assert isinstance(self.stage2, IGPT)
        Ttop = max_seq_len or self.top_res * self.top_res
        sampler = make_igpt_sampler(self.stage2, Ttop, top_k=top_k,
                                    top_p=top_p, temperature=temperature,
                                    cache_dtype=cache_dtype)
        res = int(math.isqrt(Ttop))

        def sample_pixels(variables, key, labels):
            codes = sampler(variables['stage2'], key, labels)
            ct = codes.reshape(-1, res, res)
            with int8_decode_scope():
                pixels = self.stage1.apply(
                    variables['stage1'], ct, None,
                    method=type(self.stage1).decode_code)
            return jnp.clip(pixels * 0.5 + 0.5, 0.0, 1.0), codes

        return jax.jit(sample_pixels)

    def make_pixel_sampler_multilevel(self, max_seq_len: Optional[int] = None,
                                      top_k=(None, None, None),
                                      top_p=(None, None, None),
                                      temperature=(1.0, 1.0, 1.0),
                                      cache_dtype=None,
                                      n_segments: int = 1,
                                      decode_chunk: int = 128,
                                      attention: str = 'auto'):
        """Jitted 3-level end-to-end sampler: labels -> pixels in [0, 1]
        (the `sampling_level3` path, `sampling_hqmodel.py:124-153`).

        The conv decode runs in `decode_chunk`-sample chunks like the
        2-level sampler: unchunked, the decoder's 256^2 x 128-ch
        activations are 16 MB/sample (8 GB at batch 512 — OOMs HBM)."""
        from ..sampling.engine import make_multilevel_sampler
        from .stage2.multilevel import (MultiLevelHQTransformer,
                                        cells_to_level)
        assert isinstance(self.stage2, MultiLevelHQTransformer)
        Ttop = max_seq_len or self.top_res * self.top_res
        sampler = make_multilevel_sampler(self.stage2, Ttop, top_k, top_p,
                                          temperature,
                                          cache_dtype=cache_dtype,
                                          n_segments=n_segments,
                                          attention=attention)
        top_res = int(math.isqrt(Ttop))

        def decode(variables, codes):
            px = self.stage1.apply(variables['stage1'], list(codes),
                                   method=type(self.stage1).decode_code)
            return jnp.clip(px * 0.5 + 0.5, 0.0, 1.0)

        def sample_pixels(variables, key, labels):
            tops, mids, bots = sampler(variables['stage2'], key, labels)
            codes = [
                tops.reshape(-1, top_res, top_res),
                cells_to_level(mids, top_res, 2).reshape(
                    -1, top_res * 2, top_res * 2),
                cells_to_level(bots, top_res, 4).reshape(
                    -1, top_res * 4, top_res * 4)]
            pixels = _decode_chunked(
                lambda *cs: decode(variables, list(cs)), codes, decode_chunk)
            return pixels, (tops, mids, bots)

        return jax.jit(sample_pixels)
