"""Host-side streaming and stop criteria.

Behavioral parity with the reference's ``Streamer`` / ``LogitStopper`` /
``TokenStopper`` (/root/reference/phi_3_vision_mlx.py:45-117), adapted to a
chunked decode loop: the device returns a chunk of tokens plus per-step logit
statistics, and these classes consume them sequentially on the host.
"""

from __future__ import annotations

import math
from typing import List

import numpy as np

from ..core.config import ID_EOS


class Streamer:
    """Incremental detokenizer.

    Stream mode (B=1): prints up to the last space as tokens arrive
    (reference :60-65).  Batch mode: collects tokens, truncates each row at
    its first EOS, batch-decodes (reference :72-77).

    ``stops`` makes streaming compose with stop sequences: the printer
    withholds the longest-possible stop-string suffix (``len(longest)-1``
    chars) and never prints at or past an actual stop occurrence, so the
    streamed output equals the trimmed return value.  Batch mode likewise
    trims each row at its stop before printing.
    """

    def __init__(self, tokenizer, stream: bool, mute: bool, stops=None):
        self.tokenizer = tokenizer
        self.mute = mute
        self.stream = stream and (not mute)
        self.stops = [stops] if isinstance(stops, str) else list(stops or [])
        self.holdback = max((len(s) for s in self.stops), default=1) - 1
        self.list_tokens: List = []
        self.idx_sofar = 0

    def _print_limit(self, txt: str) -> int:
        """Highest index into ``txt`` safe to print through (exclusive)."""
        limit = len(txt) - self.holdback
        cuts = [txt.find(s) for s in self.stops if s in txt]
        if cuts:
            limit = min(limit, min(cuts))
        return max(limit, 0)

    def _trim(self, txt: str) -> str:
        cuts = [txt.find(s) for s in self.stops if s in txt]
        return txt[: min(cuts)] if cuts else txt

    def __call__(self, token: np.ndarray):
        """token: (B, 1) numpy int array."""
        if not self.stream:
            self.list_tokens.append(token)
            return
        if token.shape[0] > 1:
            self.list_tokens.append(token)
            self.stream = False
            return
        self.list_tokens.append(int(token[0, 0]))
        txt = self.tokenizer.decode(self.list_tokens)
        idx_split = txt.rfind(" ", self.idx_sofar, self._print_limit(txt))
        if idx_split > 0:
            print(txt[self.idx_sofar : idx_split], end="", flush=True)
            self.idx_sofar = idx_split

    def end(self):
        if self.stream:
            txt = self.tokenizer.decode(self.list_tokens)
            print(self._trim(txt)[self.idx_sofar :], "\n", flush=True)
            return txt, len(self.list_tokens)
        arr = np.concatenate(self.list_tokens, axis=1)
        rows = arr.tolist()
        rows = [r[: r.index(ID_EOS) + 1] if ID_EOS in r else r for r in rows]
        list_txt = self.tokenizer.batch_decode(rows)
        if not self.mute:
            for i, gen in enumerate(list_txt):
                print(f"\n< Generated text for prompt #{i} >\n{self._trim(gen)}")
        return list_txt, arr.size


def validate_stops(stop) -> List[str]:
    """Normalize a user-supplied ``stop`` argument to a list of strings.

    Accepts None, a non-empty str, or a list/tuple of non-empty str; raises
    ``ValueError`` otherwise (an empty stop string would match after the
    first token and trim everything; non-strings fail later, confusingly,
    inside decode-time matching).  Caps the list at 16 entries.
    """
    if stop is None:
        return []
    if isinstance(stop, str):
        stop = [stop]
    if not isinstance(stop, (list, tuple)):
        raise ValueError(
            f"stop must be a string or a list of strings, got {type(stop).__name__}"
        )
    if len(stop) > 16:
        raise ValueError(f"at most 16 stop sequences supported, got {len(stop)}")
    for s in stop:
        if not isinstance(s, str) or not s:
            raise ValueError(f"stop entries must be non-empty strings, got {s!r}")
    return list(stop)


def stop_tail_window(stops) -> int:
    """Token-tail length sufficient for incremental stop matching.

    A stop string of L chars spans at most ~L tokens of decoded text (most
    tokens decode to >= 1 char); a window of ``L + 16`` tokens covers the
    occasional empty-decoding token with wide margin, so matching on the
    decoded tail is O(window) per step instead of O(generated-so-far).
    """
    longest = max((len(s) for s in stops), default=0)
    return longest + 16


class StopSequences:
    """Host-side stop-string matching over decoded generated text.

    The reference stops on EOS / logit heuristics only; production serving
    also wants custom stop strings ("\\n\\n", "###", ...).  Matching runs on
    decoded TEXT, not token ids, so a stop string spanning token boundaries
    still fires.  ``update`` consumes one token per row per call and returns
    True when EVERY row has matched (mirrors TokenStopper); ``trim`` cuts
    each final text at its earliest stop occurrence.  Matching decodes only
    a sliding token tail (:func:`stop_tail_window`), keeping per-token host
    work constant in generation length.
    """

    def __init__(self, tokenizer, stops, batch_size: int):
        self.stops = validate_stops(stops)
        self.tokenizer = tokenizer
        self.ids: List[List[int]] = [[] for _ in range(batch_size)]
        self.hit = np.zeros(batch_size, bool)
        self._tail = stop_tail_window(self.stops)

    def __bool__(self):
        return bool(self.stops)

    def update(self, token: np.ndarray) -> bool:
        """token: (B,) or (B,1) latest token per row."""
        if not self.stops:
            return False
        toks = np.asarray(token).reshape(-1)
        for r, t in enumerate(toks.tolist()):
            if self.hit[r]:
                continue
            self.ids[r].append(int(t))
            tail = self.ids[r][-self._tail :]
            txt = self.tokenizer.decode(tail)
            if any(s in txt for s in self.stops):
                self.hit[r] = True
        return bool(self.hit.all())

    def trim_text(self, text: str) -> str:
        cuts = [text.find(s) for s in self.stops if s in text]
        return text[: min(cuts)] if cuts else text

    def trim(self, result):
        if not self.stops:
            return result
        if isinstance(result, str):
            return self.trim_text(result)
        return [self.trim_text(t) for t in result]


class LogitStopper:
    """Early-stop heuristic (B=1 only): stop when the log-prob mass accrued
    since the best-EOS-so-far falls below that EOS score (reference :79-104).

    Consumes per-step scalars instead of full logits: ``log_prob_best`` (max
    log-softmax) and ``log_prob_eos`` (log-softmax at EOS).
    """

    def __init__(self, max_tokens: int, early_stop):
        self.step = 0
        self.early_stop = (
            early_stop if isinstance(early_stop, int) and early_stop < max_tokens else False
        )
        self.log_prob_sum = 0.0
        self.best_eos_sofar = -math.inf
        self.log_prob_sum_at_best_eos = 0.0

    def update(self, log_prob_best: float, log_prob_eos: float, batch: int) -> bool:
        if not self.early_stop:
            return False
        if batch > 1:
            self.early_stop = False
            return False
        if log_prob_eos > self.best_eos_sofar:
            since_best = self.log_prob_sum - self.log_prob_sum_at_best_eos
            if (since_best < self.best_eos_sofar) and (self.step > self.early_stop):
                return True
            self.best_eos_sofar = log_prob_eos
            self.log_prob_sum_at_best_eos = self.log_prob_sum
        self.log_prob_sum += log_prob_best
        self.step += 1
        return False


class TokenStopper:
    """Stop when every row of the batch has emitted EOS (reference :106-117)."""

    def __init__(self, batch_size: int, eos_id: int = ID_EOS):
        self.eos_id = eos_id
        self.eos_rows = np.ones(batch_size, bool)

    def update(self, token: np.ndarray) -> bool:
        """token: (B,) or (B,1)."""
        tok = np.asarray(token).reshape(-1)
        self.eos_rows &= tok != self.eos_id
        return not self.eos_rows.any()
