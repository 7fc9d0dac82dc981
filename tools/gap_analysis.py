"""Driver-gap analysis of a profile_query event log: wall time between
consecutive jobs (driver-side planning/py4j/IO) vs in-job time.

Usage: python tools/gap_analysis.py <eventlog-dir> [min_gap_ms]
"""
import json, os, sys

d = sys.argv[1]
min_gap = float(sys.argv[2]) if len(sys.argv) > 2 else 80
f = [os.path.join(d, x) for x in os.listdir(d) if not x.startswith('.')][0]
jobs = {}
for line in open(f):
    try: e = json.loads(line)
    except Exception: continue
    if e.get('Event') == 'SparkListenerJobStart':
        jobs[e['Job ID']] = [e['Submission Time'], None, e.get('Properties', {}).get('spark.job.description', '')[:80]]
    elif e.get('Event') == 'SparkListenerJobEnd':
        if e['Job ID'] in jobs: jobs[e['Job ID']][1] = e['Completion Time']
js = sorted((v[0], v[1], k, v[2]) for k, v in jobs.items() if v[1])
total = (js[-1][1] - js[0][0]) / 1000
injob = 0
cur_end = 0
for s, e, k, d_ in js:
    injob += max(0, e - max(s, cur_end)); cur_end = max(cur_end, e)
print(f"wall(first job start->last job end) {total:.2f}s, in-job {injob/1000:.2f}s, gaps {(total - injob/1000):.2f}s")
print("--- gaps >= %dms (gap is BEFORE the named job) ---" % min_gap)
prev_end = js[0][0]
for s, e, k, d_ in js:
    g = s - prev_end
    if g >= min_gap:
        print(f"  gap {g/1000:6.2f}s -> job {k:4d} ({(e-s)/1000:5.2f}s) {d_}")
    prev_end = max(prev_end, e)
