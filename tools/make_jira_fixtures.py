#!/usr/bin/env python3
"""Generate Jira fixture JSONL + golden outputs by EXECUTING the
reference implementation (/root/reference) on the fixtures. The
goldens are behavioral ground truth for the ScalaTest parity suite —
no reference code is copied, only run.
"""
import json, sys, os, types

OUT = "/root/repo/src/test/resources/jira"

def u(dn=None, name=None):
    o = {}
    if dn is not None: o["displayName"] = dn
    if name is not None: o["name"] = name
    return o

def issue(key, iid, summary=None, desc=None, status="Open", prio="Major",
          itype="Bug", reporter=None, assignee=None, created=None,
          updated=None, resolved=None, labels=None, components=None,
          versions=None, fix_versions=None, comments=None,
          status_null=False, prio_null=False, prio_empty=False):
    f = {
        "summary": summary,
        "description": desc,
        "status": None if status_null else {"name": status},
        "priority": (None if prio_null else ({} if prio_empty
                     else {"name": prio})),
        "issuetype": {"name": itype},
        "reporter": reporter,
        "assignee": assignee,
        "created": created, "updated": updated, "resolutiondate": resolved,
        "labels": labels if labels is not None else [],
        "components": [{"name": c} for c in (components or [])],
        "versions": [{"name": v} for v in (versions or [])],
        "fixVersions": [{"name": v} for v in (fix_versions or [])],
        "comment": {"comments": comments or []},
    }
    return {"key": key, "id": iid, "fields": f}

def com(author, created, body):
    return {"author": author, "created": created, "body": body}

TS = lambda d: f"2024-01-{d:02d}T00:00:00.000+0000"

test_issues = [
    issue("TEST-1", "1001", "Broker crashes on startup",
          "The broker   fails\n\twith NPE when config is missing.",
          "Open", "Major", "Bug", u("Rep One"), u("Alice Dev"),
          TS(1), TS(2), None, ["crash", "startup"], ["core", "broker"],
          ["3.1"], ["3.2"],
          [com(u("Bob"), TS(3), "I can   reproduce this."),]),
    issue("TEST-2", "1002", "Add metrics endpoint", None,
          "In Progress", "Minor", "Improvement", u("Rep Two"), None,
          TS(2), TS(3), None),
    issue("TEST-3", "1003", "Consumer lag spikes",
          "Lag grows unbounded under load.",
          "Resolved", "Critical", "Bug", u("Rep Three"), u("Carol Eng"),
          TS(3), TS(4), TS(5), [], ["consumer"], [], ["3.3"],
          [com(u("Dan"), TS(4), "Seen on 3.1 too."),
           com(u("Erin"), TS(5), "Root cause: fetch   size."),
           com(u("Frank"), TS(6), "Fixed by increasing fetch size.")]),
    issue("TEST-4", "1004", "Flaky test in CI",
          "TestFoo fails 1 in 50 runs.",
          "Closed", "Trivial", "Test", u(None, "greta"), u("Hank QA"),
          TS(4), TS(5), TS(6), ["flaky"], [],
          None, None,
          [com(u("Ivy"), TS(5), "c one"), com(u("Jay"), TS(6), "c two"),
           com(u("Kim"), TS(7), "c three"), com(u("Lee"), TS(8), "c four"),
           com(u("Mo"), TS(9), "c five")]),
    issue("TEST-5", "1005", "Dropped issue", "Has null priority.",
          "Open", "Major", "Bug", u("Rep"), u("Ann"), TS(5), TS(6), None,
          prio_null=True),
    issue("TEST-6", "1006", "  hello   world  ", "desc here",
          "Open", None, "Task", u(None, "nameonly"), None,
          TS(6), TS(7), None, prio_empty=True),
    issue("TEST-7", "1007", "Comment filtering", "Check empty comments.",
          "Open", "Major", "Bug", u("Rep"), u("Pat"), TS(7), TS(8), None,
          [], [], [], [],
          [com(u("Quin"), TS(8), "   \n\t  "),
           com(u("Rae"), TS(9), "A real comment.")]),
    issue("TEST-8", "1008", None, "Only description, no title.",
          "Open", "Major", "Bug", None, u("Sam"), TS(8), TS(9), None),
]

# TEST-9: the `status` KEY is entirely absent — the reference keeps the
# issue with status "Unknown" (fields.get("status", {}) at
# scraper.py:217), unlike TEST-5's explicit JSON null which crashes the
# per-issue extract and drops the row (scraper.py:316-318).
_t9 = issue("TEST-9", "1009", "Absent status key",
            "Status key missing entirely.", "IGNORED", "Minor", "Task",
            u("Rep Nine"), u("Nia"), TS(9), TS(10), None)
del _t9["fields"]["status"]
test_issues.append(_t9)

# TEST-10: `comment` is explicit JSON null — comment_data.get(...)
# raises AttributeError in the reference, so the issue is dropped
# (same crash-drop family as TEST-5, different field).
_t10 = issue("TEST-10", "1010", "Null comment object",
             "Comment key is JSON null.", "Open", "Major", "Bug",
             u("Rep Ten"), None, TS(10), TS(11), None)
_t10["fields"]["comment"] = None
test_issues.append(_t10)

test2_issues = [
    issue("T2-1", "2001", "Second project issue", "Some description.",
          "Open", "Minor", "Bug", u("Rep"), u("Tia"), TS(10), TS(11), None),
    issue("T2-2", "2002", "Huge description", "x" * 20010 + " end",
          "Resolved", "Blocker", "Bug", u("Rep"), u("Uma"),
          TS(11), TS(12), TS(13), [], [], [], [],
          [com(u("Vic"), TS(12), "y" * 10500),
           com(u("Wes"), TS(13), "Resolved by rollback.")]),
]

def write_jsonl(path, rows):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

def stub_modules():
    for name in ["requests", "requests.adapters", "urllib3",
                 "urllib3.util", "urllib3.util.retry", "jsonlines",
                 "tqdm", "tenacity", "ratelimit"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["requests"].Session = object
    exc = types.ModuleType("requests.exceptions")
    class _E(Exception): pass
    exc.RequestException = _E
    exc.Timeout = _E
    exc.HTTPError = _E
    exc.ConnectionError = _E
    sys.modules["requests.exceptions"] = exc
    sys.modules["requests"].exceptions = exc
    sys.modules["requests"].adapters = sys.modules["requests.adapters"]
    sys.modules["requests.adapters"].HTTPAdapter = object
    sys.modules["urllib3"].util = sys.modules["urllib3.util"]
    sys.modules["urllib3.util"].retry = sys.modules["urllib3.util.retry"]
    sys.modules["urllib3.util.retry"].Retry = object
    sys.modules["tqdm"].tqdm = lambda it, **kw: it
    def retry(*a, **k):
        def deco(fn): return fn
        return deco
    t = sys.modules["tenacity"]
    t.retry = retry
    t.stop_after_attempt = lambda *a, **k: None
    t.wait_exponential = lambda *a, **k: None
    t.retry_if_exception_type = lambda *a, **k: None
    r = sys.modules["ratelimit"]
    r.limits = retry
    r.sleep_and_retry = lambda fn: fn

def write_stub_pages(dirname, issues, page_size):
    """REST /search response pages for the DSv2 stub transport."""
    d = f"{OUT}/{dirname}"
    os.makedirs(d, exist_ok=True)
    for start in range(0, len(issues), page_size):
        body = {"startAt": start, "maxResults": page_size,
                "total": len(issues),
                "issues": issues[start:start + page_size]}
        with open(f"{d}/search_{start}.json", "w") as fh:
            json.dump(body, fh)

def main():
    os.makedirs(OUT, exist_ok=True)
    write_jsonl(f"{OUT}/raw_issues_TEST.jsonl", test_issues)
    write_jsonl(f"{OUT}/raw_issues_TEST2.jsonl", test2_issues)
    write_stub_pages("stub_TEST", test_issues, 3)
    # single-issue endpoint files (GET /issue/{key} analogue)
    for iss in test_issues:
        with open(f"{OUT}/stub_TEST/issue_{iss['key']}.json", "w") as fh:
            json.dump(iss, fh)

    stub_modules()
    sys.path.insert(0, "/root/reference")
    import scraper as ref_scraper
    import transformer as ref_transformer

    all_flat, all_examples, per_stats = {}, {}, {}
    for proj, issues in [("TEST", test_issues), ("TEST2", test2_issues)]:
        sc = ref_scraper.JiraScraper.__new__(ref_scraper.JiraScraper)
        sc.project = proj
        import logging
        sc.logger = logging.getLogger("golden")
        flat = []
        for iss in issues:
            # replicate the scrape loop's per-issue try/except drop
            # (scraper.py:297-318)
            try:
                flat.append(sc._extract_issue_data(iss))
            except Exception:
                pass
        tr = ref_transformer.DataTransformer(proj)
        examples = tr.transform_all_issues(flat)
        stats = tr.generate_statistics(examples)
        for k in ["projects", "issue_types", "priorities", "statuses"]:
            stats[k] = sorted(stats[k])
        stats["task_type_distribution"] = dict(
            sorted(stats["task_type_distribution"].items()))
        all_flat[proj] = flat
        all_examples[proj] = examples
        per_stats[proj] = stats

    for proj in all_flat:
        write_jsonl(f"{OUT}/golden_flattened_{proj}.jsonl", all_flat[proj])
        write_jsonl(f"{OUT}/golden_examples_{proj}.jsonl",
                    all_examples[proj])
    with open(f"{OUT}/golden_stats.json", "w") as fh:
        json.dump(per_stats, fh, indent=1, sort_keys=True)
    print("flat:", {p: len(v) for p, v in all_flat.items()})
    print("examples:", {p: len(v) for p, v in all_examples.items()})

if __name__ == "__main__":
    main()
