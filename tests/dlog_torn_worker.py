"""Crash-injected committer for the torn-commit durability suite
(tests/test_dlog.py). Runs one _publish_commit against a dlog table and
dies with os._exit at an injected point, simulating a committer killed
mid-publish — the parent then asserts readers see either the previous
consistent version or the complete new one, never a torn state."""

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--version", type=int, required=True)
    ap.add_argument("--crash-at", required=True,
                    choices=["tmp_partial", "before_link", "after_link",
                             "none"])
    ap.add_argument("--spin", type=float, default=0.0,
                    help="busy-pad each os-level publish step by this "
                         "many seconds so an external SIGKILL lands at "
                         "an effectively random syscall boundary")
    ap.add_argument("--fallback", action="store_true",
                    help="force the linkless O_EXCL+replace publish path")
    a = ap.parse_args()

    sys.path.insert(0, os.getcwd())
    from cql_replicator_spark import dlog

    actions = [
        {"commitInfo": {"timestamp": 1, "operation": "WRITE"}},
        {"add": {"path": f"part-v{a.version}-a.parquet",
                 "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True}},
        {"add": {"path": f"part-v{a.version}-b.parquet",
                 "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True}},
    ]

    real_open = open
    real_link = os.link

    if a.spin > 0:
        # stretch every publish-path step so a parent-issued SIGKILL at
        # a uniform random delay lands between (not just after) steps:
        # write -> [spin] -> link/claim -> [spin] -> replace -> [spin]
        import time as _time

        def slow(fn):
            def wrapped(*args, **kw):
                _time.sleep(a.spin)
                return fn(*args, **kw)
            return wrapped

        os.link = slow(os.link)
        os.replace = slow(os.replace)
        os.unlink = slow(os.unlink)

    if a.crash_at == "tmp_partial":
        # die midway through writing the tmp file: emulate by a file
        # object whose write dies after the first action line
        class _Partial:
            def __init__(self, f):
                self.f = f
                self.n = 0

            def write(self, s):
                self.f.write(s)
                self.n += 1
                if self.n >= 1:
                    self.f.flush()
                    os._exit(1)

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                self.f.close()

        def patched_open(path, mode="r", *args, **kw):
            f = real_open(path, mode, *args, **kw)
            if str(path).endswith(".tmp") and "w" in mode:
                return _Partial(f)
            return f

        import builtins
        builtins.open = patched_open
    elif a.crash_at == "before_link":
        def boom(*args, **kw):
            os._exit(1)
        os.link = boom
    elif a.crash_at == "after_link":
        def link_then_die(*args, **kw):
            real_link(*args, **kw)
            os._exit(1)
        os.link = link_then_die

    if a.fallback:
        # simulate a linkless filesystem: os.link raises OSError so
        # _publish_commit takes the O_EXCL-claim + replace path
        prev = os.link

        def no_link(*args, **kw):
            raise OSError("no hard links on this filesystem")

        if a.crash_at == "before_link":
            # in fallback terms: die between the O_EXCL claim and the
            # content replace — leaves a zero-length claim behind
            real_replace = os.replace

            def claim_then_die(src, dst):
                os._exit(1)

            os.link = no_link
            os.replace = claim_then_die
        elif a.crash_at == "after_link":
            real_replace = os.replace

            def replace_then_exit(src, dst):
                real_replace(src, dst)
                os._exit(1)

            os.link = no_link
            os.replace = replace_then_exit
        else:
            os.link = no_link

    dlog._publish_commit(a.table, a.version, actions, adds=[])
    print(json.dumps({"ok": True}))


if __name__ == "__main__":
    main()
