"""End-to-end spark-submit-shaped drive of jobs/northrule_job.py:
fresh run → full-resume run (writes nothing) → crash-window rerun
(manifest lost after write) must OVERWRITE, never duplicate."""

import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(fix, tmp, n_buckets=8):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    args = [
        sys.executable, os.path.join(REPO, "jobs", "northrule_job.py"),
        "--sequences", fix["sequences"], "--features", fix["features"],
        "--output", f"{tmp}/out", "--metrics", f"{tmp}/metrics",
        "--manifest", f"{tmp}/manifest", "--n-buckets", str(n_buckets),
        "--hot-threshold", "1000000",
    ]
    r = subprocess.run(args, env=env, capture_output=True, text=True,
                       timeout=400, cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]


def _out_rows(tmp):
    con = duckdb.connect()
    return con.execute(
        f"select count(*) from read_parquet('{tmp}/out/**/*.parquet')"
    ).fetchone()[0]


@pytest.mark.slow
def test_job_resume_and_crash_idempotence(tmp_path):
    from feathr_online_spark import datagen

    n = 5000
    fix = datagen.write_fixture(str(tmp_path / "fix"), n_seq=n)
    tmp = str(tmp_path)

    _run_job(fix, tmp)
    assert _out_rows(tmp) == n

    # full resume: every bucket marked done → second run writes nothing new
    _run_job(fix, tmp)
    assert _out_rows(tmp) == n

    # crash window: output written but manifest lost → rerun must REPLACE
    # the bucket partitions (dynamic overwrite), not append a second copy
    import shutil

    shutil.rmtree(f"{tmp}/manifest")
    _run_job(fix, tmp)
    assert _out_rows(tmp) == n


@pytest.mark.slow
def test_window_gates_on_dense_subsecond_fixture(tmp_path):
    """All window/PIT gate queries must stay oracle-green on a fixture whose
    gaps straddle the session/frame boundaries with microsecond jitter —
    the regression net for the round-1 floored-second time-math bug."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import subsecond_fixture

    fix = subsecond_fixture.write(str(tmp_path / "subsec"))
    queries = ["sessionize", "rolling", "pit_fused", "sessionize_bucketed",
               "rolling_bucketed", "pit_enrich", "lag_lead_ffill",
               "asof_purchase", "asof_bucketed", "asof_cogroup"]
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"), fix] + queries,
        env=env, capture_output=True, text=True, timeout=500, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-1000:]
    assert r.stdout.count("OK") == len(queries), r.stdout
