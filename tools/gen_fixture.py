#!/usr/bin/env python3
"""Generate a deterministic synthetic Jaeger-UI-export fixture for tests.

Shape matches the Jaeger /api/traces `data` array element shape (see
/root/reference/test/jaeger.json for the wire format): top-level JSON array of
{traceID, spans, processes, warnings}. Content is original synthetic data
(seeded RNG), NOT copied from the reference fixture.

Edge cases intentionally included:
  - a trace whose root span is missing (all spans have CHILD_OF refs)
  - a trace with an empty spans array
  - a span with TWO `error` tags (errspans counts tags, not spans)
  - a span with a duplicate tag key (last-key-wins semantics)
  - overlapping (async) sibling spans and an async tail child
  - a single-span trace
"""
import json
import random
import os

random.seed(20260812)

SERVICES = ["web", "api", "auth", "db", "cache", "queue", "search", "billing"]
OPS = {
    "web": ["/home", "/checkout", "/product"],
    "api": ["/v1/list", "/v1/get", "/v1/put"],
    "auth": ["/login", "/verify"],
    "db": ["SELECT", "INSERT", "UPDATE"],
    "cache": ["GET", "SET"],
    "queue": ["publish", "consume"],
    "search": ["/query"],
    "billing": ["/charge", "/refund"],
}
TAG_KEYS = ["component", "http.method", "http.url", "http.status_code",
            "internal.span.format", "peer.service", "db.statement",
            "retry.count", "region", "zone"]
BASE_US = 1700000000000000


def hexid(n=16):
    return "".join(random.choice("0123456789abcdef") for _ in range(n))


def mk_tags(is_root, svc, op, err=False, dup_key=False):
    tags = [
        {"key": "internal.span.format", "type": "string", "value": "proto"},
        {"key": "component", "type": "string", "value": svc},
    ]
    if svc in ("web", "api"):
        tags.append({"key": "http.method", "type": "string",
                     "value": random.choice(["GET", "POST"])})
        tags.append({"key": "http.url", "type": "string",
                     "value": f"http://{svc}.svc{op}"})
        tags.append({"key": "http.status_code", "type": "int64",
                     "value": 500 if err else 200})
    if is_root:
        tags.append({"key": "sampler.type", "type": "string", "value": "const"})
        tags.append({"key": "sampler.param", "type": "bool", "value": True})
    if random.random() < 0.3:
        tags.append({"key": "region", "type": "string",
                     "value": random.choice(["us-east", "eu-west"])})
    if err:
        tags.append({"key": "error", "type": "bool", "value": True})
    if dup_key:
        tags.append({"key": "region", "type": "string", "value": "ap-south"})
    return tags


def build_trace(idx):
    tid = hexid()
    start = BASE_US + idx * 7_000_000 + random.randint(0, 999_983)
    procs, spans = {}, []
    svc_to_pid = {}

    def pid_for(svc):
        if svc not in svc_to_pid:
            pid = f"p{len(svc_to_pid) + 1}"
            svc_to_pid[svc] = pid
            procs[pid] = {"serviceName": svc, "tags": [
                {"key": "hostname", "type": "string",
                 "value": f"host-{svc}-{idx % 3}"},
                {"key": "ip", "type": "string",
                 "value": f"10.0.{idx % 5}.{len(svc_to_pid)}"}]}
        return svc_to_pid[svc]

    def add_span(svc, op, t0, dur, parent_id, is_root=False, err=False,
                 dup_key=False, extra_err_tag=False):
        sid = tid if is_root else hexid()
        refs = [] if parent_id is None else [
            {"refType": "CHILD_OF", "traceID": tid, "spanID": parent_id}]
        tags = mk_tags(is_root, svc, op, err, dup_key)
        if extra_err_tag:
            tags.append({"key": "error", "type": "string", "value": "true"})
        spans.append({
            "traceID": tid, "spanID": sid, "flags": 1,
            "operationName": op, "references": refs,
            "startTime": t0, "duration": dur,
            "tags": tags, "logs": [], "processID": pid_for(svc),
            "warnings": None})
        return sid

    def grow(parent_id, parent_svc, t0, budget, depth):
        """Sequential children with occasional async overlap."""
        cursor = t0
        n = random.randint(1, 3) if depth < 3 else 0
        for _ in range(n):
            if budget - (cursor - t0) < 2000:
                break
            svc = random.choice([s for s in SERVICES if s != parent_svc])
            op = random.choice(OPS[svc])
            dur = random.randint(1000, max(2000, (budget - (cursor - t0)) // 2))
            cid = add_span(svc, op, cursor + random.randint(100, 900), dur,
                           parent_id)
            grow(cid, svc, cursor + 1000, dur - 1000, depth + 1)
            if random.random() < 0.25:
                # async sibling: overlaps the previous child
                svc2 = random.choice(SERVICES)
                add_span(svc2, random.choice(OPS[svc2]),
                         cursor + random.randint(100, 900),
                         random.randint(500, dur), parent_id)
            cursor += dur + random.randint(200, 2000)

    kind = idx % 10
    if kind == 7 and idx == 7:
        # missing-root trace: child spans only
        ghost = hexid()
        add_span("api", "/v1/get", start, 50000, ghost)
        add_span("db", "SELECT", start + 5000, 20000, ghost)
    elif kind == 8 and idx == 8:
        pid_for("web")  # empty trace still has a process table
    elif kind == 9 and idx == 9:
        add_span("web", "/home", start, 12345, None, is_root=True)
    else:
        root_svc = random.choice(["web", "api"])
        root_dur = random.randint(80_000, 400_000)
        err_trace = kind == 3
        rid = add_span(root_svc, random.choice(OPS[root_svc]), start, root_dur,
                       None, is_root=True,
                       dup_key=(kind == 4))
        grow(rid, root_svc, start + random.randint(500, 3000),
             root_dur - 5000, 1)
        if err_trace:
            # an error span; one of them carries two error tags
            add_span("db", "SELECT", start + root_dur // 2,
                     random.randint(1000, 9000), rid, err=True,
                     extra_err_tag=(idx == 3))
        if kind == 5:
            # async tail: child ends after the root returns
            add_span("queue", "publish", start + root_dur - 1000,
                     random.randint(20000, 60000), rid)
    return {"traceID": tid, "spans": spans, "processes": procs,
            "warnings": None}


traces = [build_trace(i) for i in range(40)]
out = os.path.join(os.path.dirname(__file__), "..",
                   "src/main/resources/jaeger_fixture.json")
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "w") as f:
    json.dump(traces, f, indent=1)

nspans = sum(len(t["spans"]) for t in traces)
keys = sorted({tag["key"] for t in traces for s in t["spans"]
               for tag in s["tags"]})
err_tags = sum(1 for t in traces for s in t["spans"]
               for tag in s["tags"] if tag["key"] == "error")
print(f"traces={len(traces)} spans={nspans} tag_keys={len(keys)} "
      f"err_tags={err_tags}")
print("keys:", keys)
