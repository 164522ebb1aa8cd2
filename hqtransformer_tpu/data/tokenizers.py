"""Text tokenizers for the txt2img path.

Mirrors the reference registry (`hqvae/tokenizers/__init__.py:15-38`):
HuggingFace BertWordPiece / ByteLevelBPE / CharBPE tokenizers built from the
same vocab files, plus padding/truncation to context_length with a [PAD]
token (`datasets/__init__.py:128-147`). The vocab files themselves are data
assets of the reference (`hqvae/tokenizers/pretrained/`,
`checkpoints/*.txt|json`); pass their location via `vocab_dir` — they are
not vendored into this repo.
"""

from __future__ import annotations

import os
from typing import List, Optional

DEFAULT_VOCAB_DIRS = (
    '/root/reference/hqvae/tokenizers/pretrained',
    '/root/reference/checkpoints',
)


def _find(vocab_dir: Optional[str], *names: str) -> str:
    dirs = [vocab_dir] if vocab_dir else list(DEFAULT_VOCAB_DIRS)
    for d in dirs:
        for n in names:
            p = os.path.join(d, n)
            if os.path.exists(p):
                return p
    raise FileNotFoundError(f'{names} not found under {dirs}; pass '
                            f'vocab_dir= with the tokenizer assets')


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
    if name in ('bpe16k_huggingface', 'bpe16k'):
        vocab = _find(vocab_dir, 'bpe-16k-vocab.json')
        merges = _find(vocab_dir, 'bpe-16k-merges.txt')
        tok = CharBPETokenizer(vocab, merges, lowercase=lowercase,
                               dropout=dropout, unk_token='[UNK]')
    elif name in ('bpe30k_huggingface', 'bpe30k'):
        vocab = _find(vocab_dir, 'bpe-30k-vocab.json')
        merges = _find(vocab_dir, 'bpe-30k-merges.txt')
        tok = CharBPETokenizer(vocab, merges, lowercase=lowercase,
                               dropout=dropout, unk_token='[UNK]')
    elif name in ('wordpiece16k_huggingface', 'bert_huggingface',
                  'wordpiece30k_huggingface'):
        vocab = _find(vocab_dir, 'bert-base-uncased-vocab.txt')
        tok = BertWordPieceTokenizer(vocab, lowercase=lowercase)
    elif name in ('bytebpe16k_huggingface',):
        vocab = _find(vocab_dir, 'vocab.json')
        merges = _find(vocab_dir, 'merges.txt')
        tok = ByteLevelBPETokenizer(vocab, merges, lowercase=lowercase,
                                    dropout=dropout)
    else:
        raise ValueError(f'unknown tokenizer {name}')
    return HFTokenizerWrapper(tok)
