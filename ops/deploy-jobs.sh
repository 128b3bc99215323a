#!/bin/bash
# Build + (re)deploy the two streaming jobs and the synthetic producer —
# the analogue of the reference's deploy-job.sh (which builds a jar
# server for Flink; Spark ships the Python package inside the app image
# instead, so there is no jar-server step).
set -ex

CLUSTER_NAME="${KIND_CLUSTER_NAME:-desktop}"

echo "ensuring topics exist..."
kubectl apply -f k8s/topics/

echo "building app image (pyspark + this package)..."
docker build -t flink-tank-spark:latest .

if command -v kind >/dev/null; then
  echo "loading image into kind..."
  kind load docker-image flink-tank-spark:latest --name "$CLUSTER_NAME"
fi

echo "(re-)creating Spark event processor job..."
kubectl delete -f k8s/spark/event-processor-job.yaml --ignore-not-found
kubectl apply -f k8s/spark/event-processor-job.yaml

echo "(re-)creating Spark aggregation job..."
kubectl delete -f k8s/spark/aggregation-job.yaml --ignore-not-found
kubectl apply -f k8s/spark/aggregation-job.yaml

echo "(re-)deploying event producer..."
kubectl delete -f k8s/producer/event-producer.yaml --ignore-not-found
kubectl apply -f k8s/producer/event-producer.yaml
kubectl wait --for=condition=available --timeout=60s \
  deployment/event-producer -n data-processing

echo "jobs + producer deployed"
echo "(batch corpus curation runs on demand: kubectl apply -f k8s/spark/curation-job.yaml)"
