"""List every job in a profile event log with its callsite + duration + preceding gap."""
import json, os, sys
d = sys.argv[1]
f = [os.path.join(d, x) for x in os.listdir(d) if not x.startswith('.')][0]
jobs = {}
for line in open(f):
    try: e = json.loads(line)
    except Exception: continue
    if e.get('Event') == 'SparkListenerJobStart':
        st = e.get('Stage Infos', [])
        cs = st[-1]['Details'].split('\n')[0] if st else '?'
        # find the deepest repo frame
        repo = [ln.strip() for ln in (st[-1]['Details'].split('\n') if st else []) if '/root/repo' in ln]
        jobs[e['Job ID']] = [e['Submission Time'], None, cs[:60], (repo[0] if repo else '')[:100]]
    elif e.get('Event') == 'SparkListenerJobEnd':
        if e['Job ID'] in jobs: jobs[e['Job ID']][1] = e['Completion Time']
js = sorted((v[0], v[1], k, v[2], v[3]) for k, v in jobs.items() if v[1])
prev = js[0][0]
for s, e, k, cs, repo in js:
    g = (s - prev)/1000
    print(f"job {k:4d} gap{g:6.2f}s dur{(e-s)/1000:6.2f}s  {cs:45s} {repo}")
    prev = max(prev, e)
