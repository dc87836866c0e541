#!/usr/bin/env python3
"""Oracle sweep one-or-more scales up (sf1+): the driver's DuckDB compare
run over a GenScale tile, per-query in a SUBPROCESS with a wall-clock
timeout — a hung oracle must not stall the sweep.

Memoized oracles: if the Verify outdir has oracle_memos.json (written by
graft.Verify from operators.OracleMemo), the shared md5-MinHash signature
chains are materialized ONCE into parquet memos under <outdir>/_memo —
the oracle-side analog of the engine's standing pair index — and the
scale-heavy queries run with their chain prefix swapped for a memo read.
Component-closure (recursive-CTE) oracles run via the union-find REPLAY:
DuckDB materializes the pair set, Python union-find replays min-label
components (a deterministic function of the pairs), and the rest of the
oracle runs in DuckDB over the replayed labels. Memoized/replayed passes
are marked in the row's detail, never silently.

Statuses: pass / fail / timeout / oom / regime. "regime" is never produced
by this script — it can only survive via merge mode from a hand-adjudicated
artifact. (q_approx_topk, formerly the one regime row, is now machine-
checked: when its exact oracle fails over sketch capacity, the sweep
verifies the Space-Saving guarantees against exact counts — see EPS_BOUND.)

Usage: verify_sweep.py <sfdir> <outdir> <artifact.json> [timeout_sec] [only,names]
(after `sbt "runMain graft.Verify <sfdir> <outdir> <regex>"`)

The artifact is re-dumped atomically after EVERY row, and the special
only-value RESUME continues an interrupted sweep: rows already in the
artifact are kept, only queries with no row yet run.
"""
import json, os, subprocess, sys, time

MARKER = "GRAFT_RESULT "


def run_sub(code, timeout):
    """Run python code in a subprocess; parse the MARKER-prefixed JSON line.

    One subprocess per oracle: DuckDB can't be interrupted in-process. The
    code is fed via STDIN, not `-c` — an oracle embedding a multi-hundred-KB
    CTE chain (ann_lsh's plane literals, the memoized capstones) overflows
    ARG_MAX as an argv element. The result is printed on a dedicated marker
    line (not bare JSON) so an oracle detail string that happens to contain
    '{"ok"' can't mis-slice the scrape.
    """
    r = subprocess.run([sys.executable, "-"], input=code, cwd="/root/repo",
                       capture_output=True, text=True, timeout=timeout)
    line = next((l[len(MARKER):] for l in reversed(r.stdout.splitlines())
                 if l.startswith(MARKER)), "")
    return line, r.stderr


def _guards():
    """Resource guards for sf10+ tiles: cap RSS well under the box (an
    uncapped heavy oracle grew to 109 GB RSS on a 128 GB host) and give
    the spill a BOUNDED home on /tmp — an sf10 ann oracle spilled >70 GB
    into the repo cwd and filled the device. Exceeding either cap fails
    THAT oracle cleanly (recorded as the oracle-resource class) instead
    of destabilizing the host or the repo filesystem.

    Caps adapt to the host (≤40% of RAM, ≤half of free /tmp; the historic
    48 GB / 40 GB figures are upper bounds, not assumptions) and the spill
    dir is per-process so concurrent sweeps can't evict each other's
    blocks. Env overrides: GRAFT_DUCK_MEM, GRAFT_DUCK_SPILL_DIR,
    GRAFT_DUCK_SPILL_CAP (DuckDB size strings, e.g. '32GB')."""
    ram_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 2**30
    tmp = os.statvfs("/tmp")
    tmp_free_gb = tmp.f_bavail * tmp.f_frsize / 2**30
    mem = os.environ.get("GRAFT_DUCK_MEM", f"{min(48, int(ram_gb * 0.4))}GB")
    spill_dir = os.environ.get("GRAFT_DUCK_SPILL_DIR",
                               f"/tmp/duck_spill_{os.getpid()}")
    spill = os.environ.get("GRAFT_DUCK_SPILL_CAP",
                           f"{min(40, max(4, int(tmp_free_gb * 0.5)))}GB")
    return (f"con.execute(\"SET memory_limit='{mem}'\")\n"
            f"con.execute(\"SET temp_directory='{spill_dir}'\")\n"
            f"con.execute(\"SET max_temp_directory_size='{spill}'\")\n")


PRELUDE = (
    "import sys, json\n"
    "sys.path.insert(0, 'tools')\n"
    # pandas maps its .so lazily; a huge DuckDB result can exhaust address
    # space first and the import then fails mid-compare — map it BEFORE
    # the query runs
    "import pandas\n"
    "import duckdb, verify_local\n"
    "con = duckdb.connect()\n"
    # slow queries emit a progress bar to stdout that would corrupt the
    # marker line — disable it
    "con.execute('PRAGMA disable_progress_bar')\n"
    + _guards())


# Sketch-bound oracles: entries whose exact oracle is only valid in a
# designed regime (q_approx_topk's Space-Saving sketch is exact-count/
# err=0 only while distinct(tokens-per-source) <= capacity=256). When the
# exact compare fails at a scale where the sketch is over capacity, the
# sweep verifies the sketch's PUBLISHED guarantees against exact DuckDB
# counts instead of hand-recording a "regime" row: for every reported
# (source, token) row, cnt - err <= true count <= cnt (Space-Saving
# over-estimate bound), err <= 2n/capacity — the single-stream bound is
# n/capacity (Metwally et al. 2005); Spark's two-level partial->final
# merge tree adds at most one more n/capacity term (per-partial errors
# are each n_p/capacity and sum pointwise to <= n/capacity; a final-level
# eviction inherits <= n/capacity once) — measured max ratio 1.03 at
# sf10 — plus the token must exist in the source at all and cnt be
# non-increasing in rk. A row that passes is recorded as pass with an
# "eps-bound" detail carrying the worst observed err/(n/capacity) ratio.
EPS_BOUND = {
    "q_approx_topk": """
WITH res AS (SELECT * FROM read_parquet('{outdir}/q_approx_topk/*.parquet')),
tok AS (SELECT source,
    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents),
exact AS (SELECT source, token, COUNT(*) AS tc FROM tok GROUP BY 1, 2),
tot AS (SELECT source, COUNT(*) AS n FROM tok GROUP BY 1),
j AS (SELECT r.source, r.rk, r.cnt, r.err, e.tc, t.n
  FROM res r JOIN exact e ON e.source = r.source AND e.token = r.token
  JOIN tot t ON t.source = r.source),
mono AS (SELECT source, rk, cnt,
    LAG(cnt) OVER (PARTITION BY source ORDER BY rk) AS prev
  FROM res)
SELECT (SELECT COUNT(*) FROM res) AS n_res,
  (SELECT COUNT(*) FROM j) AS n_join,
  (SELECT COUNT(*) FROM j
    WHERE NOT (cnt - err <= tc AND tc <= cnt
               AND CAST(err AS DOUBLE) <= 2 * CAST(n AS DOUBLE) / 256)) AS n_bad,
  (SELECT COUNT(*) FROM mono
    WHERE prev IS NOT NULL AND cnt > prev) AS n_unsorted,
  (SELECT COALESCE(MAX(CAST(err AS DOUBLE) / (CAST(n AS DOUBLE) / 256)), 0)
    FROM j) AS max_err_ratio"""}

# st_topk is q_approx_topk's streaming twin over the SAME sketch: identical
# guarantees, one extra merge level (the stream's state fold adds at most
# one more inherited eviction on top of the batch partial->final tree, so
# the err bound widens from 2n/cap to 3n/cap; the replay is single-batch,
# so the measured ratio should track the batch entry's closely).
EPS_BOUND["st_topk"] = EPS_BOUND["q_approx_topk"].replace(
    "{outdir}/q_approx_topk/", "{outdir}/st_topk/").replace(
    "CAST(err AS DOUBLE) <= 2 *", "CAST(err AS DOUBLE) <= 3 *")


def eps_bound_check(name, sfdir, outdir, timeout):
    """Returns (ok, detail) for an EPS_BOUND entry."""
    sql = EPS_BOUND[name].format(outdir=outdir)
    code = (PRELUDE + table_views(sfdir) +
            f"row = con.execute({sql!r}).fetchone()\n"
            f"print({MARKER!r} + json.dumps({{'n_res': row[0], 'n_join': row[1],"
            f" 'n_bad': row[2], 'n_unsorted': row[3], 'max_ratio': row[4]}}))\n")
    line, err = run_sub(code, timeout)
    if not line:
        return False, f"eps-bound oracle produced no result: {err.strip()[-300:]}"
    d = json.loads(line)
    ok = (d["n_res"] > 0 and d["n_join"] == d["n_res"] and d["n_bad"] == 0
          and d["n_unsorted"] == 0)
    bound = 3.0 if name == "st_topk" else 2.0
    return ok, (f"eps-bound: sketch over-capacity regime, guarantees "
                f"machine-checked against exact counts — {d['n_res']} rows, "
                f"{d['n_bad']} bound violations, {d['n_res'] - d['n_join']} "
                f"phantom tokens, {d['n_unsorted']} order violations, "
                f"max err/(n/cap) = {round(d['max_ratio'], 3)} (merge-tree "
                f"bound {bound})")


def table_views(sfdir):
    return (
        "import os\n"
        f"sfdir = {sfdir!r}\n"
        "for t in verify_local.TABLES:\n"
        "    if os.path.exists(f'{sfdir}/{t}.parquet'):\n"
        "        con.execute(f\"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'\")\n")


def memo_needs(memo_spec, query_names):
    """Transitive closure of memo names the selected memoized queries
    reference (scanning for '<token>/<name>.parquet'), plus every check
    whose payload reads a needed memo. A targeted single-query rerun must
    not pay for the whole memo set."""
    token = memo_spec["dir_token"]
    by_name = {m["name"]: m for m in memo_spec["memos"]}

    def refs(text):
        return {m for m in by_name if f"{token}/{m}.parquet" in text}

    need = set()
    frontier = set()
    for q in query_names:
        frontier |= refs(memo_spec["queries"][q])
    while frontier:
        n = frontier.pop()
        if n in need:
            continue
        need.add(n)
        m = by_name[n]
        if m["kind"] == "sql" or m["kind"].startswith("sql_chunked"):
            frontier |= refs(m["payload"])
        elif m["kind"] == "unionfind":
            frontier.add(m["payload"])
    # checks ride with the memo they validate
    for m in memo_spec["memos"]:
        if m["kind"] == "check" and refs(m["payload"]) & need:
            need.add(m["name"])
    return need


def build_memos(sfdir, outdir, memo_spec, timeout, need):
    """Materialize the needed memo side-files; returns (memo_dir, log).

    Raises on any failure — a broken memo must fail the sweep loudly, not
    fall through to 18 timeout rows. Cache keys: a memo parquet is reused
    ONLY if its recorded (payload sha256, sfdir, tile fingerprint)
    matches — a banding/knob change rewrites the payload, a tile regen
    changes the fingerprint even at the SAME path (size+mtime of every
    table parquet), and any mismatch invalidates the cache instead of
    silently reusing stale signatures or components."""
    import hashlib
    memo_dir = os.path.join(outdir, "_memo")
    os.makedirs(memo_dir, exist_ok=True)
    token, log = memo_spec["dir_token"], []

    tile_fp = sorted(
        (f, os.path.getsize(os.path.join(sfdir, f)),
         int(os.path.getmtime(os.path.join(sfdir, f))))
        for f in os.listdir(sfdir) if f.endswith(".parquet"))

    def cache_ok(name, payload):
        meta = os.path.join(memo_dir, f"{name}.meta.json")
        dest = os.path.join(memo_dir, f"{name}.parquet")
        key = {"sha": hashlib.sha256(payload.encode()).hexdigest(),
               "sfdir": os.path.realpath(sfdir),
               "tile": [list(t) for t in tile_fp]}
        if os.path.exists(dest) and os.path.exists(meta):
            try:
                if json.load(open(meta)) == key:
                    return True, None
            except Exception:
                pass
        return False, key

    def stamp(name, key):
        json.dump(key, open(os.path.join(memo_dir, f"{name}.meta.json"), "w"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    for m in memo_spec["memos"]:
        name, kind, payload = m["name"], m["kind"], m["payload"]
        if name not in need:
            continue
        dest = os.path.join(memo_dir, f"{name}.parquet")
        t0 = time.time()
        if kind == "sql":
            ok, key = cache_ok(name, payload)
            if ok:
                log.append(f"memo {name}: cached")
                continue
            sql = payload.replace(token, memo_dir)
            copy_stmt = f"COPY ({sql}) TO '{dest}.tmp.parquet' (FORMAT PARQUET)"
            code = (PRELUDE + table_views(sfdir) +
                    f"con.execute({copy_stmt!r})\n"
                    f"print({MARKER!r} + json.dumps({{'ok': True}}))\n")
            line, err = run_sub(code, timeout)
            if not line or not json.loads(line).get("ok"):
                raise RuntimeError(f"memo {name} build failed: {err.strip()[-400:]}")
            os.replace(f"{dest}.tmp.parquet", dest)
            stamp(name, key)
        elif kind.startswith("sql_chunked:"):
            # bounded-memory build of an N-per-corpus-row memo whose
            # monolithic query OOMs (the N x K assignment windows of the
            # ANN family at sf10): the payload runs once per chunk with
            # $CHUNK_IDX/$CHUNK_MOD substituted, each chunk COPYs into one
            # file of a <name>.parquet DIRECTORY, referenced by oracles as
            # read_parquet('<dir>/<name>.parquet/*.parquet')
            nchunks = int(kind.split(":", 1)[1])
            ok, key = cache_ok(name, f"{nchunks}|{payload}")
            if ok:
                log.append(f"memo {name}: cached")
                continue
            tmp_dir = f"{dest}.tmp"
            import shutil
            for p in (tmp_dir, dest):
                if os.path.isdir(p):
                    shutil.rmtree(p)
            os.makedirs(tmp_dir)
            for ci in range(nchunks):
                sql = (payload.replace(token, memo_dir)
                       .replace("$CHUNK_IDX", str(ci))
                       .replace("$CHUNK_MOD", str(nchunks)))
                copy_stmt = (f"COPY ({sql}) TO '{tmp_dir}/chunk_{ci}.parquet' "
                             f"(FORMAT PARQUET)")
                code = (PRELUDE + table_views(sfdir) +
                        f"con.execute({copy_stmt!r})\n"
                        f"print({MARKER!r} + json.dumps({{'ok': True}}))\n")
                line, err = run_sub(code, timeout)
                if not line or not json.loads(line).get("ok"):
                    raise RuntimeError(
                        f"memo {name} chunk {ci}/{nchunks} build failed: "
                        f"{err.strip()[-400:]}")
            os.replace(tmp_dir, dest)
            stamp(name, key)
            log.append(f"memo {name}: {nchunks} chunks")
        elif kind == "check":
            sql = payload.replace(token, memo_dir)
            code = (PRELUDE + table_views(sfdir) +
                    f"row = con.execute({sql!r}).fetchone()\n"
                    f"print({MARKER!r} + json.dumps({{'ok': True, 'sampled': row[0], 'match': row[1]}}))\n")
            line, err = run_sub(code, timeout)
            d = json.loads(line) if line else {}
            if not d.get("ok") or d.get("sampled", 0) == 0 or d["sampled"] != d["match"]:
                raise RuntimeError(f"memo check {name} FAILED: {d or err.strip()[-400:]}")
            log.append(f"memo {name}: {d['match']}/{d['sampled']} sample docs agree")
            continue
        elif kind == "unionfind":
            # ALWAYS rebuilt (seconds): a replay cached across a rebuilt
            # pair memo would pin stale components — not worth a cache
            src = os.path.join(memo_dir, f"{payload}.parquet")
            import unionfind
            import pyarrow.parquet as pq, pyarrow as pa
            t = pq.read_table(src)
            ia, ib = t.column(0).to_pylist(), t.column(1).to_pylist()
            nodes, labels = unionfind.labels(ia, ib)
            pq.write_table(pa.table({"id": pa.array(nodes, pa.int64()),
                                     "label": pa.array(labels, pa.int64())}), dest)
            log.append(f"memo {name}: union-find over {len(ia)} pairs → "
                       f"{len(set(labels))} components of {len(nodes)} nodes")
        else:
            raise RuntimeError(f"unknown memo kind {kind} for {name}")
        log.append(f"memo {name}: built in {round(time.time() - t0, 1)}s")
    return memo_dir, log


def main(sfdir, outdir, artifact, timeout, only=None):
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    # only={"RESUME"}: continue an interrupted sweep — keep every row the
    # artifact already has and run just the queries with no row yet
    resume = only == {"RESUME"}
    if resume:
        only = None
    memo_path = os.path.join(outdir, "oracle_memos.json")
    memo_spec = json.load(open(memo_path)) if os.path.exists(memo_path) else None
    memo_dir, memo_log, memo_sql = None, [], {}
    if memo_spec:
        memo_q = set(memo_spec["queries"]) & set(oracles)
        if only is not None:
            memo_q &= set(only)
        if memo_q:
            need = memo_needs(memo_spec, memo_q)
            # a memo is built once and amortized over the whole chain
            # class, so its budget is larger than a single row's
            memo_timeout = int(os.environ.get("GRAFT_MEMO_TIMEOUT",
                                              max(timeout * 4, 1800)))
            memo_dir, memo_log = build_memos(sfdir, outdir, memo_spec,
                                             memo_timeout, need)
            for l in memo_log:
                print(l, flush=True)
            memo_sql = {k: v.replace(memo_spec["dir_token"], memo_dir)
                        for k, v in memo_spec["queries"].items() if k in memo_q}
    results, order = {}, sorted(oracles)
    if only:
        order = [n for n in order if n in only]
    if (only or resume) and os.path.exists(artifact):
        prior = json.load(open(artifact))  # merge mode
        results = prior["results"]
        # a merge run must not clobber the artifact's record of how prior
        # memoized rows were produced — append this run's memo log to the
        # prior one (deduplicated, prior order first) so provenance covers
        # every memoized row still present in `results`
        prior_log = prior.get("memo_log", [])
        memo_log = prior_log + [l for l in memo_log if l not in prior_log]
        if resume:
            order = [n for n in order if n not in results]
    t_all = time.time()
    for name in order:
        t0 = time.time()
        sql = memo_sql.get(name, oracles[name])
        via = "memoized" if name in memo_sql else ""
        code = (PRELUDE + table_views(sfdir) +
                f"outdir, name = {outdir!r}, {name!r}\n"
                f"sql = {sql!r}\n"
                "ok, detail = verify_local.compare(con, sql, f'{outdir}/{name}')\n"
                f"print({MARKER!r} + json.dumps({{'ok': ok, 'detail': detail}}))\n")
        try:
            line, err = run_sub(code, timeout)
            try:
                d = json.loads(line)
                status = "pass" if d["ok"] else "fail"
                detail = d["detail"]
                # a DuckDB allocation/spill failure is the oracle-RESOURCE
                # class (like a timeout): a statement about the oracle's
                # cost at this scale, not about engine agreement
                if status == "fail" and any(m in (detail or "") for m in
                        ("Out of Memory", "No space left on device",
                         "max_temp_directory_size")):
                    status = "oom"
                # sketch entries: exact oracle failed → verify the sketch's
                # published error bounds instead (see EPS_BOUND)
                if status == "fail" and name in EPS_BOUND:
                    ok2, det2 = eps_bound_check(name, sfdir, outdir, timeout)
                    status = "pass" if ok2 else "fail"
                    detail = det2 + f" [exact-oracle detail: {detail}]"
            except Exception:
                status, detail = "fail", (err.strip()[-400:] or "no output")
        except subprocess.TimeoutExpired:
            status, detail = "timeout", f"oracle exceeded {timeout}s in DuckDB"
        if via and detail is not None:
            detail = (detail + "; " if detail else "") + via
        results[name] = {"status": status, "detail": detail,
                         "sec": round(time.time() - t0, 1)}
        print(f"{status.upper():7s} {name}  {results[name]['sec']}s"
              + (f"  {detail}" if detail else ""), flush=True)
        # crash-resilient: dump the artifact after EVERY row (atomic
        # rename) so a killed multi-hour sweep keeps its verdicts and a
        # RESUME run picks up at the first missing query
        dump_artifact(artifact, sfdir, timeout, t_all, memo_log, results)
    n = dump_artifact(artifact, sfdir, timeout, t_all, memo_log, results)
    print(f"\n{n['pass']} pass, {n['fail']} fail, {n['timeout']} timeout, "
          f"{n['oom']} oom, {n['regime']} regime -> {artifact}")
    return 1 if n["fail"] else 0


def dump_artifact(artifact, sfdir, timeout, t_all, memo_log, results):
    n = {s: sum(1 for v in results.values() if v["status"] == s)
         for s in ("pass", "fail", "timeout", "oom", "regime")}
    tolerant = [k for k, v in results.items()
                if "tolerant" in (v["detail"] or "")]
    out = {"sfdir": sfdir, "timeout_sec": timeout, "total_sec": round(time.time() - t_all, 1),
           "n_pass": n["pass"], "n_fail": n["fail"], "n_timeout": n["timeout"],
           "n_oom": n["oom"], "n_regime": n["regime"],
           "memo_log": memo_log,
           "tolerant_only": tolerant, "results": results}
    json.dump(out, open(artifact + ".tmp", "w"), indent=1)
    os.replace(artifact + ".tmp", artifact)
    return n


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3],
                  int(sys.argv[4]) if len(sys.argv) > 4 else 600,
                  set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None))
