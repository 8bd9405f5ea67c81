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
