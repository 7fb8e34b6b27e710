"""Train the English letter-to-sound (LTS) model for OOV words.

Sequitur-style joint-sequence model (Bisani & Ney 2008, built from the
method description — no external code): words are segmented into
*graphones* (letter-chunk, phone-chunk) with letters 1-2 / phones 0-2 per
chunk; EM over the segmentation lattice learns unigram graphone
probabilities, Viterbi alignments then train an order-3 graphone n-gram
with Witten-Bell backoff. The runtime decoder
(stylesinger_tpu/text_processors.py::_lts_decode) beam-searches the same
model, serialized compactly to stylesinger_tpu/assets/en_lts.json.

This replaces the rule-table fallback as the OOV path of the English text
processor (reference counterpart: g2p_en's neural LTS behind CMUdict,
/root/reference/data_gen/tts/txt_processors/en.py:4-5,44-80 — g2p_en is
not installable in this image, so the model is trained on the embedded
lexicon and gated on a held-out split).

Usage:
  python tools/train_en_lts.py [--holdout 0.1] [--em_iters 6] [--seed 0]
      [--out stylesinger_tpu/assets/en_lts.json]

Prints held-out phoneme/word accuracy and writes the model only when the
gate passes (--min_phone_acc, default 0.80).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAX_L, MAX_P = 2, 2  # letters / phones per graphone


def _spans(word, phones):
    """All (l, p) chunk sizes allowed at each lattice node."""
    for dl in (1, 2):
        for dp in (0, 1, 2):
            if dl == 2 and dp == 0:
                continue
            yield dl, dp


def _lattice_passes(word, phones, gp_logp, unk):
    """Forward/backward log-alphas over the segmentation lattice."""
    W, P = len(word), len(phones)
    NEG = -1e30
    fwd = [[NEG] * (P + 1) for _ in range(W + 1)]
    fwd[0][0] = 0.0
    for i in range(W + 1):
        for j in range(P + 1):
            if fwd[i][j] <= NEG:
                continue
            for dl, dp in _spans(word, phones):
                if i + dl > W or j + dp > P:
                    continue
                g = (word[i:i + dl], tuple(phones[j:j + dp]))
                s = fwd[i][j] + gp_logp.get(g, unk)
                t = fwd[i + dl][j + dp]
                fwd[i + dl][j + dp] = max(t, s) + math.log1p(
                    math.exp(min(t, s) - max(t, s))) if t > NEG else s
    bwd = [[NEG] * (P + 1) for _ in range(W + 1)]
    bwd[W][P] = 0.0
    for i in range(W, -1, -1):
        for j in range(P, -1, -1):
            if i == W and j == P:
                continue
            acc = NEG
            for dl, dp in _spans(word, phones):
                if i + dl > W or j + dp > P:
                    continue
                g = (word[i:i + dl], tuple(phones[j:j + dp]))
                s = gp_logp.get(g, unk) + bwd[i + dl][j + dp]
                if s > NEG:
                    hi, lo = max(acc, s), min(acc, s)
                    acc = hi + math.log1p(math.exp(lo - hi)) \
                        if acc > NEG else s
            bwd[i][j] = acc
    return fwd, bwd


def em_train(pairs, iters=6, verbose=True):
    """EM for unigram graphone probs; returns gp_logp dict."""
    # init: uniform over all graphones seen in any segmentation (count 1)
    counts = defaultdict(float)
    for w, ph in pairs:
        for i in range(len(w)):
            for j in range(len(ph) + 1):
                for dl, dp in _spans(w, ph):
                    if i + dl <= len(w) and j + dp <= len(ph):
                        counts[(w[i:i + dl], tuple(ph[j:j + dp]))] += 1.0
    total = sum(counts.values())
    gp_logp = {g: math.log(c / total) for g, c in counts.items()}
    unk = math.log(1.0 / total)

    for it in range(iters):
        counts = defaultdict(float)
        ll = 0.0
        for w, ph in pairs:
            fwd, bwd = _lattice_passes(w, ph, gp_logp, unk)
            z = fwd[len(w)][len(ph)]
            if z <= -1e29:
                continue
            ll += z
            for i in range(len(w) + 1):
                for j in range(len(ph) + 1):
                    if fwd[i][j] <= -1e29:
                        continue
                    for dl, dp in _spans(w, ph):
                        if i + dl > len(w) or j + dp > len(ph):
                            continue
                        g = (w[i:i + dl], tuple(ph[j:j + dp]))
                        post = fwd[i][j] + gp_logp.get(g, unk) + \
                            bwd[i + dl][j + dp] - z
                        if post > -30:
                            counts[g] += math.exp(post)
        total = sum(counts.values())
        gp_logp = {g: math.log(max(c, 1e-10) / total)
                   for g, c in counts.items()}
        unk = math.log(0.5 / total)
        if verbose:
            print(f"| EM iter {it + 1}: avg loglik "
                  f"{ll / max(len(pairs), 1):.3f}, "
                  f"{len(gp_logp)} graphones", flush=True)
    return gp_logp, unk


def viterbi_align(word, phones, gp_logp, unk):
    """Best graphone segmentation of (word, phones)."""
    W, P = len(word), len(phones)
    NEG = -1e30
    best = [[(NEG, None)] * (P + 1) for _ in range(W + 1)]
    best[0][0] = (0.0, None)
    for i in range(W + 1):
        for j in range(P + 1):
            s0 = best[i][j][0]
            if s0 <= NEG:
                continue
            for dl, dp in _spans(word, phones):
                if i + dl > W or j + dp > P:
                    continue
                g = (word[i:i + dl], tuple(phones[j:j + dp]))
                s = s0 + gp_logp.get(g, unk)
                if s > best[i + dl][j + dp][0]:
                    best[i + dl][j + dp] = (s, (i, j, g))
    if best[W][P][0] <= NEG:
        return None
    segs, i, j = [], W, P
    while (i, j) != (0, 0):
        _, back = best[i][j]
        pi, pj, g = back
        segs.append(g)
        i, j = pi, pj
    return segs[::-1]


def train_ngram(aligned, order=3):
    """Witten-Bell-smoothed graphone n-gram from Viterbi alignments.
    Tokens are graphones; sequences get (order-1) BOS and one EOS."""
    BOS, EOS = ("<s>", ()), ("</s>", ())
    counts = [defaultdict(float) for _ in range(order)]   # n=1..order
    ctx_counts = [defaultdict(float) for _ in range(order)]
    for segs in aligned:
        toks = [BOS] * (order - 1) + segs + [EOS]
        for k in range(order - 1, len(toks)):
            for n in range(1, order + 1):
                ctx = tuple(toks[k - n + 1:k])
                counts[n - 1][(ctx, toks[k])] += 1.0
                ctx_counts[n - 1][ctx] += 1.0
    return counts, ctx_counts


def serialize(counts, ctx_counts, order):
    """Compact JSON: graphone vocab + per-order count tables."""
    vocab = sorted({g for (ctx, g) in counts[0].keys()},
                   key=lambda g: (g[0], g[1]))
    gid = {g: i for i, g in enumerate(vocab)}

    def gkey(g):
        return f"{g[0]}|{' '.join(g[1])}"

    tables = []
    for n in range(1, order + 1):
        tab = {}
        for (ctx, tok), c in counts[n - 1].items():
            key = ",".join(str(gid[g]) if g in gid else "-1" for g in ctx)
            tab.setdefault(key, []).append([gid.get(tok, -1), c])
        tables.append(tab)
    ctx_tabs = []
    for n in range(1, order + 1):
        ctx_tabs.append({
            ",".join(str(gid[g]) if g in gid else "-1" for g in ctx): c
            for ctx, c in ctx_counts[n - 1].items()})
    return {
        "order": order,
        "vocab": [gkey(g) for g in vocab],
        "counts": tables,
        "ctx_counts": ctx_tabs,
    }


def load_lexicon():
    from stylesinger_tpu.text_processors import full_en_lexicon
    lex = full_en_lexicon()
    pairs = []
    for w, pr in sorted(lex.items()):
        w = w.lower()
        if not w.isalpha():     # skip apostrophe entries for LTS training
            continue
        pairs.append((w, pr.split()))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--holdout", type=float, default=0.1)
    ap.add_argument("--em_iters", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--order", type=int, default=3)
    ap.add_argument("--min_phone_acc", type=float, default=0.80)
    ap.add_argument("--out", default=os.path.join(
        REPO, "stylesinger_tpu", "assets", "en_lts.json"))
    args = ap.parse_args()

    import random
    pairs = load_lexicon()
    rng = random.Random(args.seed)
    rng.shuffle(pairs)
    n_hold = int(len(pairs) * args.holdout)
    hold, train = pairs[:n_hold], pairs[n_hold:]
    print(f"| lexicon: {len(pairs)} words ({len(train)} train / "
          f"{len(hold)} held out)")

    gp_logp, unk = em_train(train, iters=args.em_iters)
    aligned = []
    for w, ph in train:
        segs = viterbi_align(w, ph, gp_logp, unk)
        if segs:
            aligned.append(segs)
    print(f"| aligned {len(aligned)}/{len(train)}")
    counts, ctx_counts = train_ngram(aligned, order=args.order)

    model = serialize(counts, ctx_counts, args.order)
    # evaluate with the RUNTIME decoder on the held-out words
    from stylesinger_tpu.text_processors import LtsModel
    lts = LtsModel(model)
    import numpy as np
    pa, wa = [], 0
    for w, ph in hold:
        pred = lts.decode(w)
        # phoneme accuracy = 1 - normalized edit distance
        d = _edit(pred, ph)
        pa.append(1.0 - d / max(len(ph), 1))
        wa += int(pred == ph)
    phone_acc = float(np.mean(pa)) if pa else 0.0
    word_acc = wa / max(len(hold), 1)
    print(json.dumps({"metric": "en_lts", "held_out_words": len(hold),
                      "phone_acc": round(phone_acc, 4),
                      "word_acc": round(word_acc, 4),
                      "graphones": len(model["vocab"])}))
    if phone_acc < args.min_phone_acc:
        print(f"| GATE FAILED: phone_acc {phone_acc:.3f} < "
              f"{args.min_phone_acc}; model NOT written")
        return 1
    # final model trains on ALL pairs (holdout was for the gate only)
    gp_logp, unk = em_train(pairs, iters=args.em_iters, verbose=False)
    aligned = [s for w, ph in pairs
               for s in [viterbi_align(w, ph, gp_logp, unk)] if s]
    counts, ctx_counts = train_ngram(aligned, order=args.order)
    model = serialize(counts, ctx_counts, args.order)
    model["gate"] = {"held_out_phone_acc": round(phone_acc, 4),
                     "held_out_word_acc": round(word_acc, 4),
                     "holdout": args.holdout, "seed": args.seed}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(model, f)
    print(f"| wrote {args.out} "
          f"({os.path.getsize(args.out) / 1e3:.0f} kB)")
    return 0


def _edit(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


if __name__ == "__main__":
    sys.exit(main())
