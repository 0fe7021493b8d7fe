"""Engine-twin differential for oracle-DNF queries: some query pairs are
CONTRACTUALLY identical results computed by independent algorithms
(p11 large/small-star CC vs p17 star-contraction CC; p55 in-query LPA
vs p72 LPA over the persisted candidate tap; p57 broadcast
decontamination vs p67 bloom-pruned). Where the DuckDB oracle cannot
replay a query at a given scale (the sf1 recursive-CTE memory bound,
BASELINE.md round-11), comparing the two engine dumps IS a
two-implementation check of the shared contract.

    python3 tools/twin_compare.py <verify_out_dir> [a:b ...]
"""
import sys
import duckdb

out = sys.argv[1]
pairs = sys.argv[2:] or [
    "p11_neardup_dedup:p17_neardup_star",
    "p55_similarity_communities:p72_candidates_tap",
    "p57_decontaminate:p67_decontam_bloom",
]
fails = []
for pair in pairs:
    a, b = pair.split(":")
    con = duckdb.connect()
    con.sql("SET memory_limit='32GB'")
    n = con.sql(f"""
      SELECT
        (SELECT COUNT(*) FROM '{out}/{a}/*.parquet') AS na,
        (SELECT COUNT(*) FROM '{out}/{b}/*.parquet') AS nb,
        (SELECT COUNT(*) FROM
          ((SELECT * FROM '{out}/{a}/*.parquet') EXCEPT ALL
           (SELECT * FROM '{out}/{b}/*.parquet'))) AS a_minus_b,
        (SELECT COUNT(*) FROM
          ((SELECT * FROM '{out}/{b}/*.parquet') EXCEPT ALL
           (SELECT * FROM '{out}/{a}/*.parquet'))) AS b_minus_a
    """).fetchone()
    ok = n[0] == n[1] and n[2] == 0 and n[3] == 0
    print(f"{a} vs {b}: {'OK' if ok else 'MISMATCH'} "
          f"rows={n[0]}/{n[1]} a-b={n[2]} b-a={n[3]}")
    if not ok:
        fails.append(pair)
    con.close()
sys.exit(1 if fails else 0)
