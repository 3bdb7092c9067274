"""Focus-word selection for word-excitation guidance.

Reference: convofusion.py:862-906 — 'semantic' pulls BEAT keyword
annotations, 'random' POS-tags the text and prefers adjectives/adverbs then
nouns/verbs, sampling a 3-word phrase window; 'no' disables WEG.

nltk's perceptron tagger needs downloaded corpora; in zero-egress
environments a heuristic tagger (content words by length/stoplist) stands
in, preserving the phrase-window behavior.
"""
from __future__ import annotations

import random
from typing import List

_STOP = set("the a an and or of to in is are was were be been i you he she "
            "it we they this that with for on at by from as but not".split())


def _pos_focus_words(text: str) -> List[str]:
    tokens = text.split()
    try:
        import nltk
        from nltk.tokenize import word_tokenize

        tt = word_tokenize(text)
        tags = nltk.pos_tag(tt)
        fwords = [w for w, t in tags if "JJ" in t or "RB" in t]
        if not fwords:
            fwords = [w for w, t in tags
                      if "NN" in t or "VB" in t or "IN" in t]
        tokens = tt
    except Exception:
        fwords = [w for w in tokens if w.lower() not in _STOP and len(w) > 3]
    if not fwords:
        return []
    if len(fwords) > 3:
        fwords = random.sample(fwords, 3)
    # 3-word phrase window around one sampled focus word
    # (convofusion.py:889-902)
    word = random.sample(fwords, 1)[0]
    try:
        idx = tokens.index(word)
    except ValueError:
        return fwords
    return tokens[idx - 1:idx + 2] if idx > 0 else tokens[idx:idx + 2]


def select_focus_words(weg_type: str, texts_lsn: List[str],
                       sem_info=None) -> List[List[str]]:
    if weg_type == "no":
        return []
    if weg_type == "semantic":
        assert sem_info is not None, (
            "semantic WEG needs BEAT sem_info (convofusion.py:867)")
        return [[e["word"] for e in (info or [])
                 if isinstance(e.get("word"), str)] for info in sem_info]
    if weg_type == "random":
        return [_pos_focus_words(t) for t in texts_lsn]
    raise ValueError(f"unknown WEG type {weg_type}")
