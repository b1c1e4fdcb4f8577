"""CLI parity smoke tests (subprocess — the real user surface)."""

import gzip
import io
import subprocess
import sys

import pytest

REPO = "/root/repo"

HTTP = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: 50\r\n\r\n"
    b'<html><a href="http://x.example/next.html">n</a></html>'
)
HTTP = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "
    + str(len(b'<html><a href="http://x.example/next.html">n</a></html>')).encode()
    + b"\r\n\r\n"
    + b'<html><a href="http://x.example/next.html">n</a></html>'
)

RECORD = (
    b"WARC/1.0\r\n"
    b"WARC-Type: response\r\n"
    b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-00000000cli1>\r\n"
    b"WARC-Date: 2013-11-15T00:00:00Z\r\n"
    b"WARC-Target-URI: http://a.example/page.html\r\n"
    b"Content-Type: application/http;msgtype=response\r\n"
    b"Content-Length: " + str(len(HTTP)).encode() + b"\r\n\r\n" + HTTP + b"\r\n\r\n"
)


@pytest.fixture(scope="module")
def warc_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    f = d / "t.warc"
    f.write_bytes(RECORD)
    return str(f)


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "warctools_spark.cli", "--cpus", "2", *args],
        capture_output=True,
        cwd=REPO,
        timeout=300,
    )


def test_warcindex_cli(warc_file):
    r = run_cli("warcindex", warc_file)
    assert r.returncode == 0, r.stderr[-500:]
    lines = r.stdout.decode().strip().splitlines()
    assert lines[0].startswith("#WARC filename offset")
    assert "http://a.example/page.html" in lines[1]
    assert " response " in lines[1]


def test_warcfilter_cli(warc_file):
    r = run_cli("warcfilter", "-U", "a.example", warc_file)
    assert r.returncode == 0
    assert r.stdout.startswith(b"WARC/1.0\r\n")
    r2 = run_cli("warcfilter", "-U", "-i", "a.example", warc_file)
    assert r2.stdout == b""


def test_warcvalid_cli(warc_file, tmp_path):
    assert run_cli("warcvalid", warc_file).returncode == 0
    bad = tmp_path / "bad.warc"
    bad.write_bytes(b"not a warc\n" * 10)
    assert run_cli("warcvalid", str(bad)).returncode != 0


def test_warcvalid_cli_streams_systematic_errors(tmp_path):
    # r6: warcvalid streams error rows via toLocalIterator instead of
    # collect() — a systematically-broken corpus (every file bad, many
    # partitions) must still report every error row and exit nonzero
    # without materializing the whole error table on the driver.
    for i in range(40):
        (tmp_path / ("bad_%02d.warc" % i)).write_bytes(b"not a warc %d\n" % i)
    r = run_cli("warcvalid", str(tmp_path / "bad_*.warc"))
    assert r.returncode != 0
    err_lines = [
        ln for ln in r.stderr.decode().splitlines() if ln.startswith("warc errors at ")
    ]
    assert len(err_lines) == 40  # one error row per broken file, all streamed
    assert all("bad_" in ln for ln in err_lines)


def test_warclinks_cli(warc_file):
    r = run_cli("warclinks", warc_file)
    assert r.returncode == 0
    assert b"http://x.example/next.html" in r.stdout


def test_warc2warc_cli(warc_file, tmp_path):
    out = tmp_path / "out.warc"
    r = run_cli("warc2warc", "-D", "-o", str(out), warc_file)
    assert r.returncode == 0, r.stderr[-500:]
    data = out.read_bytes()
    assert data.startswith(b"WARC/1.0\r\n")
    assert b'<a href="http://x.example/next.html">' in data


def test_warcextract_cli(warc_file):
    r = run_cli("warcextract", warc_file, "0")
    assert r.returncode == 0
    assert r.stdout == HTTP


def test_cli_corpus(tmp_path):
    """corpus subcommand: survivors sharded to parquet with a JSON
    summary line."""
    import json
    import subprocess
    import sys

    out = tmp_path / "corpus"
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "warctools_spark.cli",
            "--cpus",
            "4",
            "corpus",
            "--docs",
            "/root/testdata/sf0.001/documents.parquet",
            "-o",
            str(out),
            "--shards",
            "2",
        ],
        capture_output=True,
        cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr.decode()[-500:]
    summary = json.loads(res.stdout.decode().strip().splitlines()[-1])
    assert summary["shards"] == 2
    assert 0 < summary["rows"] <= summary["input_rows"]
    assert (out / "_SUCCESS").exists()


def test_cli_warcwet(warc_file, tmp_path):
    out = str(tmp_path / "out.wet.warc")
    r = subprocess.run(
        [sys.executable, "-m", "warctools_spark.cli", "--cpus", "2",
         "warcwet", "-o", out, warc_file],
        capture_output=True, cwd=REPO, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = open(out, "rb").read()
    assert data.startswith(b"WARC/1.0\r\n")
    assert b"WARC-Type: conversion" in data
    assert b"WARC-Refers-To: <urn:uuid:" in data
    assert b"Content-Type: text/plain" in data
    # payload is the extracted text of the response body
    assert b'<html><a href="http://x.example/next.html">n</a></html>' in data


def test_cli_warcwet_gzip(warc_file, tmp_path):
    out = str(tmp_path / "out.wet.warc.gz")
    r = subprocess.run(
        [sys.executable, "-m", "warctools_spark.cli", "--cpus", "2",
         "warcwet", "-Z", "-o", out, warc_file],
        capture_output=True, cwd=REPO, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = open(out, "rb").read()
    assert data[:2] == b"\x1f\x8b"  # per-record gzip members
    body = gzip.decompress(data)
    assert body.startswith(b"WARC/1.0\r\n")
    assert b"WARC-Type: conversion" in body


def test_cli_warcindex_cdx(warc_file):
    r = subprocess.run(
        [sys.executable, "-m", "warctools_spark.cli", "--cpus", "2",
         "warcindex", "--cdx", warc_file],
        capture_output=True, cwd=REPO, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.decode().rstrip().splitlines()
    assert lines[0] == " CDX N b a m s k S"
    fields = lines[1].split(" ")
    assert fields[0] == "example,a)/page.html"   # SURT urlkey
    assert fields[1] == "20131115000000"          # ts14
    assert fields[2] == "http://a.example/page.html"
    assert fields[4] == "200"
    assert len(fields[5]) == 64                   # sha256 hex digest


def test_warccdxj_cli(warc_file, tmp_path):
    import gzip
    import json
    import os

    out = str(tmp_path / "cdxj")
    r = run_cli("warccdxj", "-o", out, warc_file)
    assert r.returncode == 0, r.stderr[-500:]
    assert b"shards" in r.stdout
    lines = []
    for name in sorted(os.listdir(out)):
        if name.startswith("part-"):
            with open(os.path.join(out, name)) as fh:
                lines += fh.read().splitlines()
    assert lines == sorted(lines) and len(lines) == 1
    key, ts14, js = lines[0].split(" ", 2)
    assert key.startswith("example,a)")
    assert json.loads(js)["url"] == "http://a.example/page.html"

    outz = str(tmp_path / "zipnum")
    r = run_cli("warccdxj", "-o", outz, "--zipnum", "--block-lines", "5", warc_file)
    assert r.returncode == 0, r.stderr[-500:]
    assert b"blocks" in r.stdout
    summary = open(os.path.join(outz, "zipnum-summary.txt")).read().splitlines()
    assert len(summary) == 1
    bk, fname, off, length = summary[0].rsplit(" ", 3)
    with open(os.path.join(outz, fname), "rb") as fh:
        fh.seek(int(off))
        member = fh.read(int(length))
    assert gzip.decompress(member).decode().splitlines() == lines
