"""Phoneme tokenizer for the STP task.

The reference pulls ``Cnam-LMSSC/vibravox-phonemes-tokenizer`` from the hub
(``configs/lightning_datamodule/stp.yaml``) — a ``Wav2Vec2CTCTokenizer`` with
38 tokens and pad id 35 (asserted at ``wav2vec2_for_stp.py:228-249``).  This
module builds the same tokenizer class locally from the French phoneme
inventory (33 IPA phonemes + word delimiter + unk/pad/bos/eos), so offline
environments keep a working STP stack; when the hub is reachable the
pretrained tokenizer takes priority for exact id compatibility.
"""

from __future__ import annotations

import json
import tempfile
from pathlib import Path

__all__ = ["FRENCH_PHONEMES", "build_phoneme_tokenizer", "load_phoneme_tokenizer"]

# French IPA phoneme inventory as used by the vibravox phonemizer
# (espeak/phonemizer fr-fr output alphabet).  Wav2Vec2CTCTokenizer splits
# text per unicode codepoint, so every entry must be a single codepoint:
# nasal vowels (ɑ̃ ɔ̃ ɛ̃ œ̃) decompose into the base vowel + the combining
# tilde U+0303, which is its own token.
FRENCH_PHONEMES = [
    "a", "b", "d", "e", "f", "i", "j", "k", "l", "m", "n", "o", "p", "s",
    "t", "u", "v", "w", "y", "z", "ø", "ŋ", "œ", "ɑ", "ɔ", "ə", "ɛ",
    "ɡ", "ʁ", "ʃ", "ʒ", "ɥ", "̃",
]


def build_phoneme_tokenizer(save_dir: str | None = None):
    """Build a Wav2Vec2CTCTokenizer over the French phoneme vocab.

    Vocab layout: 33 phonemes (ids 0..32), "|" word delimiter (33),
    <unk> (34), <pad> (35), <s> (36), </s> (37) — 38 tokens with pad 35,
    matching the shape the reference asserts.
    """
    from transformers import Wav2Vec2CTCTokenizer

    vocab = {ph: i for i, ph in enumerate(FRENCH_PHONEMES)}
    vocab["|"] = len(vocab)
    vocab["<unk>"] = len(vocab)
    vocab["<pad>"] = len(vocab)
    vocab["<s>"] = len(vocab)
    vocab["</s>"] = len(vocab)
    assert vocab["<pad>"] == 35 and len(vocab) == 38

    directory = Path(save_dir) if save_dir else Path(tempfile.mkdtemp(prefix="phoneme_tok_"))
    directory.mkdir(parents=True, exist_ok=True)
    (directory / "vocab.json").write_text(json.dumps(vocab, ensure_ascii=False))
    return Wav2Vec2CTCTokenizer(
        str(directory / "vocab.json"),
        unk_token="<unk>",
        pad_token="<pad>",
        bos_token="<s>",
        eos_token="</s>",
        word_delimiter_token="|",
    )


def load_phoneme_tokenizer(name_or_path: str = "Cnam-LMSSC/vibravox-phonemes-tokenizer"):
    """Hub tokenizer when reachable, local reconstruction otherwise."""
    try:
        from transformers import Wav2Vec2CTCTokenizer

        return Wav2Vec2CTCTokenizer.from_pretrained(name_or_path)
    except Exception:
        return build_phoneme_tokenizer()
