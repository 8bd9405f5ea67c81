"""Workbench for clean-room transcription of ISO 11172-3 Table B.7
Huffman tables — the gate that decides which tables ship into
``decode.MP3_HUFF_TABLES`` at all.

Method: each candidate table is entered as two matrices exactly as the
spec prints them — hlen[x][y] and hcod[x][y] — and validated against
the three properties only the genuine table satisfies simultaneously:

  1. exact xlen-by-ylen grid coverage,
  2. prefix-freeness of the (hlen, hcod) codeword set (no duplicates,
     no codeword a prefix of another),
  3. Kraft sum exactly 1 (a COMPLETE code: every binary string is a
     codeword or extends one).

Completeness makes the gate unusually sharp: with a complete code, ANY
single wrong hcod of the right length must either duplicate another
leaf or land inside another codeword's subtree, so it cannot pass
silently.  The residual undetectable error class is an equal-length
codeword SWAP between two cells, so the workbench also checks two
style invariants every validated table exhibits (near-symmetric
hlen(x,y) ~ hlen(y,x) within 1, and strictly decreasing same-length
hcod along each row) and flags violations for re-inspection.

The hole-tiling reconstruction used in round 11 for tables 11/12:
when all failures localize to one row, remove that row and compute the
uncovered leaf runs — if the recalled hcod VALUES of the row exactly
tile those runs (tables 11 and 12 did, via six and eight disjoint
runs), the row's lengths are FORCED and the transcription is confirmed
by two independent memory channels agreeing.

Outcome record (round 11):
  - tables 8, 9, 10, 11, 12: VALIDATED, shipped.
      t9/t10 passed on first transcription; t8 needed the single-cell
      repair hlen(5,3)=9 (the only repair consistent with the Kraft
      deficit, the duplicate-code site, AND both style invariants);
      t11 row 5 / t12 row 7 reconstructed by hole-tiling as above.
  - table 13 hlen recall: Kraft +321 x 2^-16 (multiple cell errors).
  - table 15 hlen recall: Kraft -1 x 2^-13 (exactly one 13-bit cell
    should be 12-bit, but ~10 candidate cells and no reliable hcod
    recall to force the choice).
  - table 16 hlen recall: Kraft -3538 x 2^-17.
  - table 24 hlen recall: Kraft -1571 x 2^-13.
  The four 16x16 tables therefore stay behind the declared
  NotImplementedError boundary: without a validating transcription,
  shipping would risk a silently-wrong table, which is worse than an
  honest raise.

Round-12 decision: no further recall attempts were made for tables
13/15/16/24.  Rounds 10 and 11 both produced recalls failing Kraft by
large margins (+321, -1, -3538, -1571 leaf units respectively), and a
third attempt would have to "repair" hundreds of cells against the
Kraft arithmetic — recreating, at 4x the scale, exactly the
equal-length-swap risk the t10 row-6 note documents.  The boundary
stands until an independent validation channel exists (a real MP3
granule decoded by another implementation, or a second published
transcription to cross-check against); the round instead shipped the
layers that ARE derivable: intensity stereo (exact-surd Q15 ratios)
and Table B.6 pretab (short, invariant-gated).

Round-13 outcome: tables 15, 24 and (later in the round, see
round13_t16_record) 16 VALIDATED and shipped — every B.7 table except
13 now ships.  What changed: instead of scoring each fresh
16x16 recall as a monolith, the recall was split into its inner
15x15 block and its last row/column, because the round-13 fresh
transcriptions showed all duplicate/prefix conflicts clustering in
row 15 / column 15 (a table-edge transcription artifact):

  - t15 inner 15x15: 0 conflicts, Kraft deficit exactly 37/4096.
  - t24 inner 15x15: 0 conflicts, Kraft deficit exactly 121/512.
  - t13: conflicts also in row 14 -> stays a boundary (see below).
  - t16: conflicts in rows 1 and 13 -> stays a boundary.

For a clean inner block, the uncovered leaf space decomposes into
maximal aligned subtrees (23 holes for t15, 5 for t24) and the 31
edge cells must tile it EXACTLY — a far sharper constraint than
whole-table Kraft.  An exhaustive solver (DFS over the leaf space,
one aligned slot per cell) enumerated every tiling+assignment
satisfying the style invariants all eleven previously validated
tables exhibit: same-length hcod strictly decreasing along rows AND
columns (checked: holds on every shipped table except one
hole-reconstructed t11 column), and |hlen(x,y)-hlen(y,x)| <= 1.

  t15: 589 valid solutions; 9 recalled edge cells sat exactly on
  maximal holes (pinned), and ranking by (edge-length monotonicity
  violations, recall agreement) left 4 candidates differing in one
  8-cell region.  The winner — identical to the solution derived by
  independent manual constraint propagation BEFORE running the
  solver — uses no gratuitous hole splitting, has perfectly
  monotone edge length profiles, and its code runs (26,21,16,11
  step -5 along row 15; 30,25,20,15 along column 15) extend the
  inner block's own arithmetic structure.

  t24: the recalled row 15 was confirmed VERBATIM by the tiling
  (16/16 cells, including the 4-bit (15,15) ESC/ESC corner); the
  only repairs were four column-15 LENGTHS (7,7,6,6 -> 8,8,8,8 at
  x=11..14, values 6/4/2/0 kept), whose mass delta equals the
  recall's +128-leaf Kraft excess EXACTLY, and the resulting
  even/odd code interleave (column takes even len-8 codes 6,4,2,0;
  row takes odd 7,5,3,1) matches the interleave the upper half of
  the same edge exhibits (column 14,12,10 / row 15,13,11,9,7).
  The alternative 4-cell repair (swapping which line takes the
  len-7 pair 6/4) scored 6 exact recall matches lower and broke
  the interleave; no third repair satisfies the mass equation.

  t13: the trusted block (x<=13, y<=14) IS clean (0 conflicts,
  deficit 1672 leaf-19 units over 30 maximal holes), but 46 cells
  (row 14 + row 15 + column 15) would need the tiling solve with
  only 7 exact-hole recall anchors — attempted this round, see
  round13_t13_notes() for the hole table and anchor list.
  t16: the fresh recall's +287 x 2^-16 Kraft EXCESS and 12 prefix
  conflicts all localize to rows 1 and 13 plus cell (14,12); with
  those 33 cells removed the 13-row trusted block validates clean,
  and the row-tiling solve closed the table later in the round —
  see round13_t16_record() below.  Both linbits families 16-23 and
  24-31 ship.

Residual risk for the two newly shipped tables (same class as the
t10 row-6 note): an equal-length code swap between two cells that
both style invariants and the recall channel tie on.  For t15 the
four tied candidates differed in exactly one region and were settled
by recall+structure as above; for t24 the row-1 len-10 run
(327, 345, ...) violates row monotonicity as recalled, but swapping
(1,10)/(1,11) breaks MORE invariants (column 11 monotonicity), so
the recall order ships and the cell pair is flagged UNVERIFIED here.

Round-13 double-entry record (tables 8-12, the round-12 ADVICE item):
second-sitting transcriptions of t8, t9, t10 were machine-diffed
against the shipped matrices:
  - t8: 0 disagreements (including the round-11 hlen(5,3)=9 repair).
  - t9: 0 disagreements.
  - t10: exactly 2 — the (6,3)/(6,4) len-10 pair, where the fresh
    sitting reproduced the ORIGINAL recall order 11,16 against the
    round-11 style reorder 16,11.  Since the monotonicity heuristic
    now has counterexamples inside recall-agreed data (t10 column
    6's len-9 run 12,19,18 appears in BOTH sittings and violates
    column order; a single-value (0,6)<->(5,1) swap would "fix" it
    but both sittings place 12 at (0,6)), two agreeing recalls
    outrank the heuristic: row 6 ships as 11,16,6,
    verified-by-double-entry, and the heuristic is demoted from
    "override recall" to "flag for re-inspection".
  t11 row 5 / t12 row 7 need no double entry: their values are
  FORCED by the hole-tiling (a stronger channel than recall).
"""
from fractions import Fraction


def validate(name, codes, xlen, ylen, verbose=True):
    """codes: {(hlen, hcod): (x, y)}.  Returns True iff the table
    passes grid + prefix + Kraft.  Prints diagnostics."""
    problems = []
    grid = {(x, y) for x in range(xlen) for y in range(ylen)}
    if set(codes.values()) != grid or len(codes) != xlen * ylen:
        problems.append("grid coverage broken")
    items = sorted(codes.items())
    for i, ((l1, c1), xy1) in enumerate(items):
        if c1 >= (1 << l1):
            problems.append(f"{xy1}: hcod {c1} needs > {l1} bits")
        for (l2, c2), xy2 in items[i + 1:]:
            if l2 > l1 and (c2 >> (l2 - l1)) == c1:
                problems.append(
                    f"{c1:0{l1}b} ({xy1}) is a prefix of "
                    f"{c2:0{l2}b} ({xy2})"
                )
            elif (l2, c2) == (l1, c1):
                problems.append(f"duplicate code: {xy1} vs {xy2}")
    kraft = sum(Fraction(1, 1 << l) for l, _ in codes)
    maxlen = max(l for l, _ in codes)
    ok = kraft == 1 and not problems
    if verbose:
        print(f"{name}: kraft={kraft} "
              f"(delta={(kraft - 1) * (1 << maxlen)} x 2^-{maxlen}) "
              f"{'OK' if ok else 'FAIL'}")
        for p in problems[:20]:
            print("  ", p)
    return ok


def style_check(name, codes, xlen, ylen):
    """The two style invariants observed on every validated table;
    violations are transcription-suspect cells, not hard failures."""
    hlen = [[0] * ylen for _ in range(xlen)]
    hcod = [[0] * ylen for _ in range(xlen)]
    for (l, c), (x, y) in codes.items():
        hlen[x][y], hcod[x][y] = l, c
    for x in range(min(xlen, ylen)):
        for y in range(x + 1, min(xlen, ylen)):
            if abs(hlen[x][y] - hlen[y][x]) > 1:
                print(f"{name}: symmetry suspect ({x},{y})="
                      f"{hlen[x][y]} vs ({y},{x})={hlen[y][x]}")
    for x in range(xlen):
        by_len = {}
        for y in range(ylen):
            by_len.setdefault(hlen[x][y], []).append(hcod[x][y])
        for l, vals in by_len.items():
            if vals != sorted(vals, reverse=True):
                print(f"{name}: row {x} len-{l} hcods not "
                      f"decreasing: {vals}")


def holes_after_removing(codes, remove_cells, maxlen):
    """Uncovered leaf runs at maxlen once remove_cells' codes are
    dropped — the hole-tiling reconstruction helper."""
    covered = set()
    for (l, c), xy in codes.items():
        if xy in remove_cells:
            continue
        lo = c << (maxlen - l)
        covered.update(range(lo, lo + (1 << (maxlen - l))))
    hs = sorted(set(range(1 << maxlen)) - covered)
    runs = []
    for h in hs:
        if runs and runs[-1][1] == h - 1:
            runs[-1][1] = h
        else:
            runs.append([h, h])
    return runs


def round13_t13_notes():
    """The state of the table-13 solve at the end of round 13: the
    trusted block (x<=13 AND y<=14, 210 cells) validates clean with a
    Kraft deficit of 1672 leaf-19 units over these 30 maximal holes
    (len, code):

      (14,0) (15,2) (16,7) (16,8) (16,11) (15,6) (16,16) (14,5)
      (14,6) (14,8) (16,42) (14,11) (15,29) (14,15) (13,8) (13,10)
      (13,12) (15,53) (14,27) (13,14) (12,8) (13,19) (11,7) (12,16)
      (13,35) (13,36) (13,39) (12,20) (12,23) (13,48)

    46 cells must tile them (row 14, row 15, column 15).  Recalled
    cells sitting EXACTLY on maximal holes (the anchors):
      (14,0)=13/48  (14,1)=12/23  (14,3)=13/39   [row 14]
      (15,3)=14/27  (15,6)=15/29                 [row 15]
      (0,15)=13/19  (7,15)=16/42                 [column 15]
    plus near-anchors where the recalled VALUE matches a hole one
    level up/down ((14,4)~13/36, (14,5)~13/35, (14,6)~15/53,
    (14,8)~16/16, (15,1)~14/15, (1,15)~13/14).

    End-of-round state: constraint propagation from the anchors
    forced 39 of the 46 cells — the recalled values tile the holes
    under the same systematic misread patterns t15/t24 exhibited
    (same value one level shallower: 13/20->12/20, 14/36->13/36,
    15/16->14/16, 16/6->15/6; value doubling at the same length:
    15/11->15/22), every placement mutually consistent with row/
    column same-length monotonicity and trusted-mirror symmetry.
    The LAST SEVEN cells — the deep corner (14,13..15), (15,12..15)
    over holes 16/{0,1,2,4} + 17/23 — remain underdetermined: the
    exhaustive DFS finds 4486 invariant-valid tilings with a 3-way
    recall-score tie at the top, the recalled corner values (1,4,2,
    1,1,0,1 at claimed len 16-18) cannot all be placed, and some
    cell must own 17/23 (sibling of the (10,15)=17/22 anchor) with
    no recall support anywhere in the corner.  The length-
    monotonicity heuristic discriminates nothing (minimum 3
    violations even among the anchored cells — consistent with its
    round-13 demotion after the t10 double-entry).  Shipping any of
    the tied corners would be a guess that in-repo tests cannot
    falsify (synth shares the table), so table 13 stays a boundary.
    Late-round refinement after the t16 descendant-pattern lesson:
    reopening the (14,12) pin (recalled 16/6 could be the doubling-
    misread of a 15/6 descendant) and re-ranking all 41k+ corner
    tilings with misread-aware scoring STILL leaves a tie at the
    top — two solutions differing only in which of (15,13)/(15,15)
    takes 16/1 vs 17/1, with 17/23's position floating among three
    cells one rank below.  The corner is information-theoretically
    underdetermined from this recall; t13 stays out.
    Next independent channel: a fresh double-entry of ONLY the
    corner 3x4 region at a later sitting, or a real t13 stream from
    another implementation."""


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "/root/repo")
    from open_source_etl_spark.multimodal.decode import MP3_HUFF_TABLES
    from open_source_etl_spark.multimodal.synth import MP3_HT_DIMS

    n_ok = 0
    for t, tab in sorted(MP3_HUFF_TABLES.items()):
        dim = MP3_HT_DIMS[t]
        n_ok += validate(f"table {t}", tab, dim, dim)
        style_check(f"table {t}", tab, dim, dim)
    print(f"{n_ok}/{len(MP3_HUFF_TABLES)} shipped tables validate")


def round13_t16_record():
    """Round-13 (late session) t16 outcome: VALIDATED and shipped.
    The trusted block = every row except 1 and 13 plus cell (14,12)
    validated standalone (0 conflicts, deficit exactly 7565/32768
    over 30 maximal holes).  The recalled untrusted cells then tiled
    the holes with overwhelming agreement:
      - all 16 row-1 cells sit on holes — 11 at the recalled
        (len, code) exactly, 5 at the recalled value one level
        deeper (the same systematic slip t13/t15 showed);
      - row 13: 9 exact-hole matches; 211/210 are the two halves of
        hole 11/105; 370/379 match len-13 holes exactly;
      - the deep corner closed by the DESCENDANT pattern: recalled
        3459 and 6917 are hole 16/1729's unique length-17/18
        descendants under the mass equation ({14,15,15,17,18,18} is
        the only multiset fitting 36 leaf-18 units over 6 cells),
        and recalled "(14,12) = 16/3458" is the doubling-misread of
        the remaining leaf 18/6916.
    Style caveat, recorded deliberately: t16's own TRUSTED rows
    violate the small tables' row-monotonicity (rows 7/12/14) and
    +-1 length symmetry ((9,12)=13 vs (12,9)=15), so neither
    heuristic was weighed against recall for this table — consistent
    with the round-13 demotion of the heuristics after the t10
    double-entry.  Residual risk class: unchanged (equal-length
    swaps inside the trusted recall block)."""
