"""Text tokenizers for the txt2img path.

Mirrors the reference registry (`hqvae/tokenizers/__init__.py:15-38`):
HuggingFace BertWordPiece / ByteLevelBPE / CharBPE tokenizers built from the
same vocab files, plus padding/truncation to context_length with a [PAD]
token (`datasets/__init__.py:128-147`). The vocab files are PUBLIC data
assets (OpenAI CLIP's bpe_simple_vocab_16e6, HuggingFace BPE/WordPiece
vocabs — the same files the reference bundles under
`hqvae/tokenizers/pretrained/`); a copy is vendored under
`hqtransformer_tpu/assets/tokenizers/` so txt2img is self-contained, and
`vocab_dir=` / --vocab-dir / HQT_VOCAB_DIR override the location.
"""

from __future__ import annotations

import os
from typing import List, Optional

_BUNDLED_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'assets', 'tokenizers')


def _find_group(vocab_dir: Optional[str], *names: str) -> List[str]:
    """Resolve a SET of paired tokenizer assets (e.g. vocab + merges) from a
    SINGLE directory: explicit `vocab_dir=` (the CLIs expose `--vocab-dir`)
    or HQT_VOCAB_DIR take precedence; otherwise fall back to the vendored
    copies under `hqtransformer_tpu/assets/tokenizers/`.

    Paired assets are all-or-nothing per directory: an explicit dir holding
    the vocab but not the merges raises instead of silently mixing the
    user's vocab with the bundled merges — an inconsistent pair produces
    wrong token ids that look like a model-quality bug."""
    if vocab_dir is None:
        vocab_dir = os.environ.get('HQT_VOCAB_DIR')
    if vocab_dir:
        paths = [os.path.join(vocab_dir, n) for n in names]
        present = [p for p in paths if os.path.exists(p)]
        if len(present) == len(names):
            return paths
        if present:
            missing = [n for n, p in zip(names, paths)
                       if not os.path.exists(p)]
            raise FileNotFoundError(
                f'explicit vocab dir {vocab_dir!r} holds only part of the '
                f'paired assets {names} (missing: {missing}); vocab/merges '
                'must come from one directory — a mixed pair yields wrong '
                'token ids')
        import warnings
        warnings.warn(
            f'{names} not found under the explicit vocab dir {vocab_dir!r}; '
            f'falling back to the bundled copies in {_BUNDLED_DIR}',
            stacklevel=3)
    paths = [os.path.join(_BUNDLED_DIR, n) for n in names]
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f'{missing} not found under the bundled assets ({_BUNDLED_DIR})')
    return paths


def _find(vocab_dir: Optional[str], name: str) -> str:
    return _find_group(vocab_dir, name)[0]


class HFTokenizerWrapper:
    """Pads/truncates to context_length with [PAD]
    (`datasets/__init__.py:128-147`)."""

    def __init__(self, tok, pad_token: str = '[PAD]'):
        self.tok = tok
        pad_id = tok.token_to_id(pad_token)
        if pad_id is None:
            pad_id = 0
        self.pad_id = pad_id

    def encode(self, text: str) -> List[int]:
        return self.tok.encode(text).ids

    def encode_padded(self, text: str, context_length: int) -> List[int]:
        ids = self.encode(text)[:context_length]
        return ids + [self.pad_id] * (context_length - len(ids))

    @property
    def vocab_size(self) -> int:
        return self.tok.get_vocab_size()


def create_tokenizer(name: str = 'bpe16k_huggingface',
                     vocab_dir: Optional[str] = None,
                     lowercase: bool = True,
                     dropout: Optional[float] = None):
    """Registry dispatch (`tokenizers/__init__.py:15-38`). `dropout` applies
    BPE dropout for training (`dropout=None` for eval)."""
    from tokenizers import CharBPETokenizer, ByteLevelBPETokenizer
    from tokenizers.implementations import BertWordPieceTokenizer

    dropout = dropout if dropout and dropout > 0 else None
    if name == 'clip':
        return ClipSimpleTokenizer(
            _find(vocab_dir, 'bpe_simple_vocab_16e6.txt.gz'))
    if name in ('bpe16k_huggingface', 'bpe16k'):
        vocab, merges = _find_group(vocab_dir, 'bpe-16k-vocab.json',
                                    'bpe-16k-merges.txt')
        tok = CharBPETokenizer(vocab, merges, lowercase=lowercase,
                               dropout=dropout, unk_token='[UNK]')
    elif name in ('bpe30k_huggingface', 'bpe30k'):
        vocab, merges = _find_group(vocab_dir, 'bpe-30k-vocab.json',
                                    'bpe-30k-merges.txt')
        tok = CharBPETokenizer(vocab, merges, lowercase=lowercase,
                               dropout=dropout, unk_token='[UNK]')
    elif name in ('wordpiece16k_huggingface', 'bert_huggingface',
                  'wordpiece30k_huggingface'):
        vocab = _find(vocab_dir, 'bert-base-uncased-vocab.txt')
        tok = BertWordPieceTokenizer(vocab, lowercase=lowercase)
    elif name in ('bytebpe16k_huggingface',):
        vocab, merges = _find_group(vocab_dir, 'vocab.json', 'merges.txt')
        tok = ByteLevelBPETokenizer(vocab, merges, lowercase=lowercase,
                                    dropout=dropout)
    else:
        raise ValueError(f'unknown tokenizer {name}')
    return HFTokenizerWrapper(tok)


# ---------------------------------------------------------------------------
# CLIP SimpleTokenizer (BPE over the bundled bpe_simple_vocab_16e6.txt.gz,
# `hqvae/tokenizers/simple_tokenizer.py`). ftfy is unavailable here; text
# cleaning falls back to html-unescape + NFC normalization, which matches
# ftfy.fix_text on well-formed input (divergence only on mojibake).
# ---------------------------------------------------------------------------

import gzip
import html
import unicodedata
from functools import lru_cache


@lru_cache()
def _bytes_to_unicode():
    bs = (list(range(ord('!'), ord('~') + 1)) +
          list(range(ord('\xa1'), ord('\xac') + 1)) +
          list(range(ord('\xae'), ord('\xff') + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _clean_text(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = unicodedata.normalize('NFC', text)
    import re as _re
    return _re.sub(r'\s+', ' ', text).strip().lower()


class ClipSimpleTokenizer:
    """CLIP BPE tokenizer with <|startoftext|>/<|endoftext|> wrapping and
    fixed-length padding (pad = eot), mirroring the reference's
    SimpleTokenizer.padded_tokens_and_len semantics."""

    def __init__(self, bpe_path: Optional[str] = None):
        import regex as re
        bpe_path = bpe_path or _find(None, 'bpe_simple_vocab_16e6.txt.gz')
        merges = gzip.open(bpe_path).read().decode('utf-8').split('\n')
        merges = merges[1:49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        vocab = list(_bytes_to_unicode().values())
        vocab = vocab + [v + '</w>' for v in vocab]
        for merge in merges:
            vocab.append(''.join(merge))
        vocab.extend(['<|startoftext|>', '<|endoftext|>'])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {'<|startoftext|>': '<|startoftext|>',
                      '<|endoftext|>': '<|endoftext|>'}
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""", re.IGNORECASE)
        self.sot = self.encoder['<|startoftext|>']
        self.eot = self.encoder['<|endoftext|>']

    def _bpe(self, token):
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + '</w>',)
        pairs = _get_pairs(word)
        if not pairs:
            return token + '</w>'
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(
                p, float('inf')))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and \
                        word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        word = ' '.join(word)
        self.cache[token] = word
        return word

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        for token in self.pat.findall(_clean_text(text)):
            token = ''.join(self.byte_encoder[b]
                            for b in token.encode('utf-8'))
            bpe_tokens.extend(self.encoder[t]
                              for t in self._bpe(token).split(' '))
        return bpe_tokens

    def encode_padded(self, text: str, context_length: int) -> List[int]:
        ids = [self.sot] + self.encode(text)[:context_length - 2] + \
            [self.eot]
        return ids + [self.eot] * (context_length - len(ids))

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)
