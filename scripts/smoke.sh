#!/usr/bin/env bash
# Combined smoke test (the analog of the reference's combined_smoke.sh):
# boots a full deployment with the offline echo model + hash embeddings,
# runs preflight health checks, a chat turn with source verification, the
# data API, and tears down.  Zero egress.
set -euo pipefail

WORK=$(mktemp -d)
trap 'python -m archi_tpu.cli.cli_main delete -n smoke 2>/dev/null || true; rm -rf "$WORK"' EXIT
export ARCHI_TPU_DEPLOYMENTS="$WORK/deployments"

mkdir -p "$WORK/corpus"
echo "Submit jobs with the batch scheduler. The long queue allows 48h jobs." \
  > "$WORK/corpus/guide.md"

cat > "$WORK/config.yaml" <<YAML
services:
  chat:         {enabled: true, host: 127.0.0.1, port: 7871}
  data_manager: {enabled: true, host: 127.0.0.1, port: 7872}
data_manager:
  embedding_name: hash
  sources:
    local_files:
      paths: [$WORK/corpus]
YAML

echo "== create deployment =="
python -m archi_tpu.cli.cli_main create -n smoke -c "$WORK/config.yaml"

echo "== preflight: wait for health + ingestion =="
ok=""
for i in $(seq 1 90); do
  ok=$(curl -sf -m 2 http://127.0.0.1:7872/api/ingestion/status \
       | python -c "import json,sys; print(json.load(sys.stdin).get('status'))" \
       2>/dev/null || true)
  [ "$ok" = "done" ] && break
  sleep 2
done
[ "$ok" = "done" ] || { echo "FAIL: ingestion never finished"; exit 1; }
curl -sf -m 5 http://127.0.0.1:7871/healthz > /dev/null
echo "services healthy, ingestion done"

echo "== chat turn =="
curl -sf -m 300 -X POST http://127.0.0.1:7871/api/get_chat_response \
  -H 'Content-Type: application/json' \
  -d '{"message": "how do I submit jobs?"}' | python -c "
import json, sys
d = json.load(sys.stdin)
assert d['answer'], 'empty answer'
assert any(s['display_name'] == 'guide.md' for s in d['sources']), d['sources']
print('chat OK; sources:', [s['display_name'] for s in d['sources']])
"

echo "== data API =="
curl -sf -m 5 http://127.0.0.1:7872/api/stats | python -c "
import json, sys
d = json.load(sys.stdin)
assert d['chunks'] > 0
print('stats OK:', d['chunks'], 'chunks')
"

echo "SMOKE PASSED"
