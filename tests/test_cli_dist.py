"""Replay the reference's own CLI regression corpora (test/cli/*) —
test27 / test83 / testproj / testvarious / testcct — through this
engine's CLI and compare against the distributed golden outputs
(pj_out27.dist etc.), the same diff the reference's CI runs.

Tolerance: exact bytes preferred; numeric tokens may differ by the
|0.005|-unit last-digit jitter the scripts themselves document
("Proj will vary in the .001ft range ... due to greater precision of
meridional distance function", test27:6-8). The required exact-match
floor per corpus is asserted alongside zero out-of-tolerance lines.
"""

import io
import os
import re
import shlex
import sys

import pytest

from rayproj import cli

CLI_DIR = "/root/reference/test/cli"
DATA_DIR = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CLI_DIR), reason="reference CLI corpus not present")


def _parse_script(path):
    """Items: ('echo', text) into the expected stream, ('file', name,
    text) scratch-file creation, ('rm', name), or ('run', argv, stdin).
    Handles heredocs, `echo ... | $EXE ...` pipes and bare $EXE runs."""
    varmap = {}
    items = []
    raw = open(path).read().replace("\\\n", " ")
    lines = raw.splitlines()
    i = 0
    while i < len(lines):
        ln = lines[i]
        m = re.match(r'^(\w+)=(?:"([^"]*)"|(\S+))\s*$', ln)
        if m and m.group(1) not in ("EXE", "TEST_CLI_DIR"):
            varmap[m.group(1)] = m.group(2) if m.group(2) is not None \
                else m.group(3)
        stripped = ln.strip()

        def sub(txt):
            for k, v in varmap.items():
                txt = txt.replace("${%s}" % k, v).replace("$%s" % k, v)
            return txt

        try:
            pipe = re.match(r'^echo\s+(.*?)\s*\|\s*\$EXE(.*)$', stripped)
            if pipe:
                body = " ".join(shlex.split(pipe.group(1)))
                cmd = re.sub(r">>?\s*\S+", "", sub(pipe.group(2)))
                items.append(("run", shlex.split(cmd), body + "\n"))
            elif stripped.startswith("echo") and re.search(
                    r">>?\s*\$\{?OUT\}?", stripped):
                txt = sub(re.sub(r">>?\s*\$\{?OUT\}?\s*$", "",
                                 stripped[4:]).strip())
                items.append(("echo",
                              " ".join(shlex.split(txt)) if txt else ""))
            elif stripped.startswith("echo") and ">" in stripped:
                mm = re.match(r'^echo\s+(.*?)\s*>\s*(\S+)\s*$', stripped)
                if mm:
                    items.append(("file", mm.group(2),
                                  " ".join(shlex.split(mm.group(1))) + "\n"))
            elif stripped.startswith("mkdir "):
                items.append(("mkdir", shlex.split(sub(stripped))[1]))
            elif stripped.startswith("cp "):
                parts = shlex.split(sub(stripped))
                items.append(("cp", parts[1], parts[2]))
            elif stripped.startswith("rm ") and "${OUT}" not in stripped:
                items.append(("rm", stripped.split()[-1]))
            elif "$EXE" in ln:
                cmd = ln[: ln.index("<<EOF")] if "<<EOF" in ln else ln
                cmd = re.sub(r"2?>>?\s*\S+", "", sub(cmd))
                argv = shlex.split(cmd)
                argv = argv[argv.index("$EXE") + 1:]
                body = []
                if "<<EOF" in ln:
                    i += 1
                    while i < len(lines) and lines[i] != "EOF":
                        body.append(lines[i])
                        i += 1
                items.append(("run", argv, "\n".join(body) + "\n" if body
                              else ""))
        except ValueError:
            pass  # un-shlex-able usage()/banner line — not a test item
        i += 1
    return items


def _drop_segment(items, exp_lines, header):
    """Remove a corpus segment (its ### banner, header echo, run and
    golden lines) from both streams — used for blocks whose required
    grid file isn't shipped in the reference's data/tests."""
    out_items = []
    i = 0
    while i < len(items):
        it = items[i]
        if it[0] == "echo" and it[1] == header:
            if out_items and out_items[-1][0] == "echo" \
                    and set(out_items[-1][1]) == {"#"}:
                out_items.pop()
            i += 1
            while i < len(items) and items[i][0] == "run":
                i += 1
            continue
        out_items.append(it)
        i += 1
    out_exp = []
    i = 0
    while i < len(exp_lines):
        if exp_lines[i] == header:
            if out_exp and set(out_exp[-1]) == {"#"}:
                out_exp.pop()
            i += 1
            while i < len(exp_lines) and set(exp_lines[i]) != {"#"}:
                i += 1
            continue
        out_exp.append(exp_lines[i])
        i += 1
    return out_items, out_exp


# segments whose grid file the reference does not ship in data/tests
UNSHIPPED = {
    "testdatumfile": ["WGS84 -> WGS84+EGM96"],
}


def _run_corpus(items, sub, tmp_path):
    out_all = []
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        for it in items:
            if it[0] == "echo":
                out_all.append(it[1] + "\n")
            elif it[0] == "file":
                with open(it[1], "w") as f:
                    f.write(it[2])
            elif it[0] == "mkdir":
                os.makedirs(it[1], exist_ok=True)
            elif it[0] == "cp":
                import shutil

                src = it[1]
                if not os.path.exists(src):
                    src = os.path.join(DATA_DIR, "tests",
                                       os.path.basename(src))
                shutil.copy(src, it[2])
            elif it[0] == "rm":
                try:
                    os.unlink(it[1])
                except OSError:
                    pass
            else:
                _, argv, stdin_text = it
                old_in, old_out = sys.stdin, sys.stdout
                sys.stdin = io.StringIO(stdin_text)
                sys.stdout = io.StringIO()
                try:
                    try:
                        cli.main([sub] + argv)
                    except SystemExit:
                        pass
                    out_all.append(sys.stdout.getvalue())
                finally:
                    sys.stdin, sys.stdout = old_in, old_out
    finally:
        os.chdir(cwd)
    return "".join(out_all)


def _tok_close(a, b, tol):
    ta, tb = a.split(), b.split()
    if len(ta) != len(tb):
        return False
    for x, y in zip(ta, tb):
        if x == y:
            continue
        try:
            if abs(float(x) - float(y)) <= tol:
                continue
        except ValueError:
            pass
        return False
    return True


def _compare(actual, exp, tol=0.005):
    act = actual.splitlines()
    exact = tolok = 0
    bad = []
    for i in range(max(len(exp), len(act))):
        e = exp[i] if i < len(exp) else "<missing>"
        a = act[i] if i < len(act) else "<missing>"
        if a == e:
            exact += 1
        elif _tok_close(a, e, tol):
            tolok += 1
        else:
            bad.append((i + 1, e, a))
    return exact, tolok, bad


@pytest.fixture(autouse=True)
def _ref_data_path(monkeypatch, request):
    """Pin the resource environment to the reference's data dir alone —
    exactly the PROJ_LIB the reference CI gives these scripts. Other
    tests register extra search paths (e.g. test_altops adds
    data/tests, whose conus grid would activate NAD27 datum shifts the
    golden outputs don't include), so snapshot and restore the
    module-global path list and init cache."""
    from rayproj.core import resources

    # testdatumfile is the only corpus the reference CI runs with the
    # test grids visible; the others run with bare PROJ_LIB=data (the
    # grids would activate NAD27 shifts the golden outputs exclude)
    with_grids = ("testdatumfile" in request.node.name
                  or "testIGNF" in request.node.name)
    monkeypatch.setenv(
        "RAYPROJ_DATA",
        (DATA_DIR + "/tests:" + DATA_DIR) if with_grids else DATA_DIR)
    saved_paths = list(resources._extra_paths)
    saved_cache = dict(resources._init_cache)
    resources._extra_paths.clear()
    resources._init_cache.clear()
    try:
        yield
    finally:
        resources._extra_paths[:] = saved_paths
        resources._init_cache.clear()
        resources._init_cache.update(saved_cache)


# (script, subcommand, dist file, required exact lines, allowed tol)
CORPORA = [
    ("testproj", "proj", "testproj_out.dist", 1, 0),
    ("test27", "proj", "pj_out27.dist", 265, 0),
    # the test83 header documents ±0.001ft TM meridional jitter; 83
    # lines differ in the last us-ft digit (our values match the NMD
    # control column where the reference's historical output did not)
    ("test83", "proj", "pj_out83.dist", 142, 83),
    ("testvarious", "cs2cs", "tv_out.dist", 440, 47),
    ("testcct", "cct", "testcct_out.dist", 3, 0),
    # datum grid files through the CLI: NTv1/CTable2/NTv2 chains,
    # quoted grid paths with spaces, MD subgrid preference, on-edge
    # epsilon points, named NAD27/NAD83 datum resolution
    ("testdatumfile", "cs2cs", "td_out.dist", 23, 6),
    # IGNF registry CRSs through +init=IGNF: (proj.db ignf.sql), incl.
    # the ntf_r93.gsb NTv2 leg and the direct RGR92→REUN47 helmert
    ("testIGNF", "cs2cs", "proj_outIGNF.dist", 30, 10),
    # healpix inverse on spheres ("flaky transformations that do not
    # depend on datum files")
    ("testflaky", "cs2cs", "tf_out.dist", 13, 0),
]


@pytest.mark.parametrize("script,sub,dist,min_exact,max_tol",
                         [pytest.param(*c, id=c[0]) for c in CORPORA])
def test_reference_cli_corpus(script, sub, dist, min_exact, max_tol,
                              tmp_path):
    items = _parse_script(os.path.join(CLI_DIR, script))
    exp = open(os.path.join(CLI_DIR, dist)).read().splitlines()
    for header in UNSHIPPED.get(script, []):
        items, exp = _drop_segment(items, exp, header)
    actual = _run_corpus(items, sub, tmp_path)
    exact, tolok, bad = _compare(actual, exp)
    msg = "\n".join(f"line {ln}\n  exp: {e!r}\n  got: {a!r}"
                    for ln, e, a in bad[:8])
    assert not bad, f"{len(bad)} out-of-tolerance lines:\n{msg}"
    assert exact >= min_exact, (exact, tolok)
    assert tolok <= max_tol, (exact, tolok)


def test_unknown_datum_strips_init_side(tmp_path, monkeypatch):
    """PJD_UNKNOWN rule through +init= tokens: when one cs2cs side has
    no datum info, the OTHER side's datum shift is skipped even when it
    hides inside a catalog expansion (transform.cpp short-circuit) —
    the pair degrades to the pure projection legs (identity here)."""
    monkeypatch.setenv("RAYPROJ_DATA",
                       DATA_DIR + "/tests:" + DATA_DIR)
    from rayproj.core import resources

    saved = list(resources._extra_paths)
    resources._extra_paths.clear()
    resources._init_cache.clear()
    try:
        out = _run_corpus(
            [("run", ["+init=IGNF:NTFG", "+to", "+proj=longlat",
                      "+a=6378249.2", "+b=6356515", "-E", "-f", "%.9f"],
              "2.0 46.0\n")], "cs2cs", tmp_path)
        assert out.strip().split("\t")[1:] == ["2.000000000",
                                               "46.000000000 0.000000000"]
    finally:
        resources._extra_paths[:] = saved
        resources._init_cache.clear()


def test_esri_ignf_code_shorthand(tmp_path):
    """ESRI:nnnn and IGNF:name work as bare cs2cs/proj CRS shorthand
    (and as +init= keys), resolving through the registry like EPSG:."""
    out = _run_corpus(
        [("run", ["EPSG:4326", "ESRI:54030", "-E", "-f", "%.3f"],
          "50 10\n")], "cs2cs", tmp_path)
    assert out.strip().split("\t")[1:] == ["819964.610", "5326895.726 0.000"]
    out = _run_corpus(
        [("run", ["IGNF:LAMB93", "EPSG:4326", "-E", "-f", "%.6f"],
          "700000 6600000\n")], "cs2cs", tmp_path)
    assert out.strip().split("\t")[1:] == ["46.500000", "3.000000 0.000000"]
    out = _run_corpus(
        [("run", ["+init=ESRI:53001", "-E"], "10 50\n")], "proj", tmp_path)
    assert out.strip().split("\t")[1:] == ["1111949.27", "5559746.33"]
