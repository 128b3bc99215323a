#!/bin/bash
# Spark-UI access helper — the Spark analogue of the reference's
# portforward-ui.sh (Flink session-cluster UI on 8081). Spark on the
# spark-operator has no session cluster: each SparkApplication's DRIVER
# pod serves its own UI on 4040, so this forwards a named job's driver.
#
#   ./ops/portforward-ui.sh [job-name] [local-port] [namespace]
#
# Defaults: event-processor, 4040, data-processing. The spark-operator
# labels driver pods with sparkoperator.k8s.io/app-name=<job> and
# spark-role=driver.
set -e

JOB="${1:-event-processor}"
LOCAL_PORT="${2:-4040}"
NAMESPACE="${3:-data-processing}"

echo "Finding driver pod for SparkApplication '$JOB'..."

POD=$(kubectl get pods -n "$NAMESPACE" \
    -l "sparkoperator.k8s.io/app-name=$JOB,spark-role=driver" \
    -o jsonpath='{.items[0].metadata.name}')

if [ -z "$POD" ]; then
    echo "No driver pod found for SparkApplication '$JOB' in namespace '$NAMESPACE'"
    echo "Running jobs:"
    kubectl get sparkapplications -n "$NAMESPACE"
    exit 1
fi

echo "Found driver pod: $POD"
echo "Spark UI at http://localhost:$LOCAL_PORT"
echo ""

kubectl port-forward -n "$NAMESPACE" "$POD" "$LOCAL_PORT:4040"
