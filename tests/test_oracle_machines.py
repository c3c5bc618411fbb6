"""The recursive-CTE oracles are independent re-implementations of the
stateful kernels (pathway encoder, natural cubic spline). These tests fuzz
BOTH directions on random data — DuckDB machine vs numpy kernel — so an
oracle bug can't silently agree with a kernel bug at the one committed
dataset. No Spark involved: this exercises exactly the pair of machines the
driver's correctness gate compares.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb
import numpy as np

from aisdb_spark.operators.encoder import _encode_conv
from aisdb_spark.operators.interp import _natural_cubic_coeffs

MAX_JUMP, MAX_RATE, MINSCORE = 4.0, 0.001, 1e-6
STEP = 600 * 1_000_000


def _pathway_sql() -> str:
    """The committed oracle's machine, re-pointed at a plain table ``tv``
    (conv_id, turn_idx, t_us, value) — textually the same recursion as
    aisdb_spark.queries._pathways_oracle."""
    return f"""
WITH RECURSIVE
base AS (
  SELECT conv_id, turn_idx, t_us,
    CAST(value AS DOUBLE) AS dv,
    CASE WHEN lag(value) OVER w IS NULL THEN 0
         WHEN abs(value - lag(value) OVER w) >= {MAX_JUMP}
           OR abs(value - lag(value) OVER w)
              / greatest((t_us - lag(t_us) OVER w) / 1e6, 1e-6) >= {MAX_RATE}
         THEN 1 ELSE 0 END AS brk
  FROM tv WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
segrows AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY conv_id ORDER BY turn_idx
    ROWS UNBOUNDED PRECEDING) AS INT) AS seg
  FROM base
),
segs AS (
  SELECT conv_id, seg,
    first(dv ORDER BY turn_idx) AS sv, first(t_us ORDER BY turn_idx) AS st,
    last(dv ORDER BY turn_idx) AS ev, last(t_us ORDER BY turn_idx) AS et
  FROM segrows GROUP BY conv_id, seg
),
rec AS (
  SELECT conv_id, seg, CAST(0 AS BIGINT) AS assigned,
    [{{'t': et, 'v': ev}}] AS paths
  FROM segs WHERE seg = 0
  UNION ALL
  SELECT s.conv_id, s.seg,
    CASE WHEN best_score >= {MINSCORE} THEN best_p - 1 ELSE len(r.paths) END,
    CASE WHEN best_score >= {MINSCORE}
      THEN r.paths[1:best_p-1] || [{{'t': s.et, 'v': s.ev}}]
           || r.paths[best_p+1:len(r.paths)]
      ELSE list_append(r.paths, {{'t': s.et, 'v': s.ev}}) END
  FROM rec r JOIN segs s ON s.conv_id = r.conv_id
    AND s.seg = r.seg + 1,
  LATERAL (
    SELECT list_max(scores) AS best_score,
      len(scores) - list_position(list_reverse(scores), list_max(scores)) + 1
        AS best_p
    FROM (SELECT list_transform(r.paths, p ->
      CASE WHEN abs(s.sv - p.v) / greatest((s.st - p.t)/1e6, 1e-6) >= {MAX_RATE}
             OR abs(s.sv - p.v) >= 2.0 * {MAX_JUMP}
           THEN -1.0
           ELSE {MAX_JUMP} / greatest(
             abs(s.sv - p.v) / greatest((s.st - p.t)/1e6, 1e-6), 1e-9)
      END) AS scores)
  )
)
SELECT sr.conv_id, sr.turn_idx, CAST(r.assigned AS INTEGER) AS pathway_id
FROM segrows sr JOIN rec r USING (conv_id, seg)
ORDER BY conv_id, turn_idx"""


def test_pathway_oracle_machine_matches_kernel_fuzz():
    rng = np.random.default_rng(101)
    rows = []
    for c in range(25):
        n = int(rng.integers(1, 60))
        t = np.cumsum(rng.integers(1, 5_000_000_000, n))
        v = rng.integers(0, 80, n).astype(float)
        rows += [(f"c{c}", i, int(t[i]), float(v[i])) for i in range(n)]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tv(conv_id VARCHAR, turn_idx INT, t_us BIGINT, value DOUBLE)"
    )
    con.executemany("INSERT INTO tv VALUES (?,?,?,?)", rows)
    got = con.execute(_pathway_sql()).fetchall()

    byconv = defaultdict(list)
    for c, i, t, v in rows:
        byconv[c].append((i, t, v))
    exp = {}
    for c, rs in byconv.items():
        rs.sort()
        t = np.array([r[1] for r in rs], dtype=np.int64)
        v = np.array([r[2] for r in rs])
        out = _encode_conv(t, v, MAX_JUMP, MAX_RATE, MINSCORE)
        for (i, _, _), p in zip(rs, out):
            exp[(c, i)] = int(p)
    assert len(got) == len(exp)
    assert all(exp[(c, i)] == p for c, i, p in got)


def test_spline_tridiagonal_recursion_matches_numpy_fuzz():
    """fwd/bwd recursive CTE == the numpy Thomas solve, bit-for-bit, plus
    the multiply-chain polynomial evaluation the kernel uses."""
    rng = np.random.default_rng(202)
    rows = []
    for c in range(18):
        n = int(rng.integers(2, 50))
        t0 = int(rng.integers(0, 10**9))
        t = t0 + np.cumsum(rng.integers(1, 2_000_000_000, n))
        if n > 4:
            t[2] = t[1]  # duplicate timestamps exercise the dedup
        v = rng.normal(50, 20, n)
        rows += [("c%d" % c, 0, i, int(t[i]), float(v[i])) for i in range(n)]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE seg(conv_id VARCHAR, segment_id INT, turn_idx INT,"
        " t_us BIGINT, value DOUBLE)"
    )
    con.executemany("INSERT INTO seg VALUES (?,?,?,?,?)", rows)
    sql = f"""
WITH RECURSIVE
ordered AS (
  SELECT *, lead(t_us) OVER wo AS next_t
  FROM seg WINDOW wo AS (PARTITION BY conv_id, segment_id ORDER BY t_us, turn_idx)
),
dedup AS (
  SELECT conv_id, segment_id, t_us, value FROM ordered
  WHERE next_t IS NULL OR next_t != t_us
),
pts AS (
  SELECT conv_id, segment_id,
    CAST(row_number() OVER wp - 1 AS BIGINT) AS i, t_us, value AS y,
    CAST(t_us - first(t_us) OVER wp AS DOUBLE) AS x,
    count(*) OVER (PARTITION BY conv_id, segment_id) AS npts
  FROM dedup WINDOW wp AS (PARTITION BY conv_id, segment_id ORDER BY t_us)
),
good AS (SELECT * FROM pts WHERE npts >= 3),
knot AS (
  SELECT conv_id, segment_id, i, x, y, npts, npts - 1 AS n,
    lead(x) OVER wk - x AS h,
    lag(x) OVER wk AS x_prev, lead(x) OVER wk AS x_next,
    lead(y) OVER wk AS y_next,
    x - lag(x) OVER wk AS h_prev,
    CASE WHEN i >= 1 AND i <= npts - 2 THEN
      3.0 * (lead(y) OVER wk - y) / (lead(x) OVER wk - x)
      - 3.0 * (y - lag(y) OVER wk) / (x - lag(x) OVER wk)
    END AS alpha
  FROM good WINDOW wk AS (PARTITION BY conv_id, segment_id ORDER BY i)
),
fwd AS (
  SELECT conv_id, segment_id, CAST(0 AS BIGINT) AS i,
    CAST(0.0 AS DOUBLE) AS mu, CAST(0.0 AS DOUBLE) AS z, n
  FROM knot WHERE i = 0
  UNION ALL
  SELECT k.conv_id, k.segment_id, k.i,
    k.h / (2.0 * (k.x_next - k.x_prev) - k.h_prev * f.mu),
    (k.alpha - k.h_prev * f.z) / (2.0 * (k.x_next - k.x_prev) - k.h_prev * f.mu),
    f.n
  FROM fwd f JOIN knot k ON k.conv_id = f.conv_id
    AND k.segment_id = f.segment_id AND k.i = f.i + 1
  WHERE f.i + 1 <= f.n - 1
),
bwd AS (
  SELECT conv_id, segment_id, n AS j, CAST(0.0 AS DOUBLE) AS c, n AS n2
  FROM fwd WHERE i = 0
  UNION ALL
  SELECT b.conv_id, b.segment_id, b.j - 1, f.z - f.mu * b.c, b.n2
  FROM bwd b JOIN fwd f ON f.conv_id = b.conv_id
    AND f.segment_id = b.segment_id AND f.i = b.j - 1
  WHERE b.j - 1 >= 0
),
coef AS (
  SELECT k.conv_id, k.segment_id, k.x, k.y,
    (k.y_next - k.y) / k.h - k.h * (c1.c + 2.0 * c0.c) / 3.0 AS b,
    c0.c AS c,
    (c1.c - c0.c) / (3.0 * k.h) AS d
  FROM knot k
  JOIN bwd c0 ON c0.conv_id = k.conv_id AND c0.segment_id = k.segment_id
    AND c0.j = k.i
  JOIN bwd c1 ON c1.conv_id = k.conv_id AND c1.segment_id = k.segment_id
    AND c1.j = k.i + 1
  WHERE k.i <= k.npts - 2
),
sbounds AS (
  SELECT conv_id, segment_id, min(t_us) AS t0, max(t_us) AS t_end,
    max(x) AS x_end,
    max(CASE WHEN i = npts - 1 THEN y END) AS y_end
  FROM good GROUP BY 1, 2
),
sgrid AS (
  SELECT b.conv_id, b.segment_id, g.g AS t_g,
    CAST(g.g - b.t0 AS DOUBLE) AS gx, b.x_end, b.y_end
  FROM sbounds b, LATERAL (
    SELECT unnest(generate_series(b.t0, b.t_end + {STEP} - 1, {STEP})) AS g
  ) g
)
SELECT g.conv_id, g.segment_id, g.t_g,
  CASE WHEN g.gx > g.x_end THEN g.y_end
       ELSE co.y + co.b * (g.gx - co.x)
            + co.c * ((g.gx - co.x) * (g.gx - co.x))
            + co.d * (((g.gx - co.x) * (g.gx - co.x)) * (g.gx - co.x))
  END AS value
FROM sgrid g
ASOF JOIN coef co
  ON co.conv_id = g.conv_id AND co.segment_id = g.segment_id AND g.gx >= co.x
ORDER BY 1, 2, 3"""
    got = con.execute(sql).fetchall()

    byseg = defaultdict(list)
    for c, s, i, t, v in rows:
        byseg[(c, s)].append((t, i, v))
    exp = []
    for (c, s), rs in sorted(byseg.items()):
        rs.sort(key=lambda r: (r[0], r[1]))
        t = np.array([r[0] for r in rs], dtype=np.int64)
        v = np.array([r[2] for r in rs])
        keep = np.append(t[1:] != t[:-1], True)
        t, v = t[keep], v[keep]
        if len(t) < 3:
            continue
        x = (t - t[0]).astype(np.float64)
        b, c2, d = _natural_cubic_coeffs(x, v)
        grid = np.arange(t[0], t[-1] + STEP, STEP, dtype=np.int64)
        gx = (grid - t[0]).astype(np.float64)
        j = np.clip(np.searchsorted(x, gx, side="right") - 1, 0, len(x) - 2)
        dx = gx - x[j]
        dx2 = dx * dx
        out = v[j] + b[j] * dx + c2[j] * dx2 + d[j] * (dx2 * dx)
        out = np.where(gx > x[-1], v[-1], out)
        exp += [(c, s, int(tg), float(val)) for tg, val in zip(grid, out)]
    assert len(got) == len(exp)
    for g, e in zip(got, sorted(exp)):
        assert g[:3] == tuple(e[:3])
        assert g[3] == e[3]  # BIT-exact, no tolerance
