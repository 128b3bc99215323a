#!/bin/bash
# Cluster bootstrap for the Spark deployment — the analogue of the
# reference's create-infra.sh (flink-operator + Strimzi), re-targeted at
# the Kubeflow spark-operator. Idempotent; assumes kubectl+helm point at
# the target cluster (kind or real).
set -ex

# Spark operator (replaces the reference's Flink operator + cert-manager
# webhook chain — the spark-operator helm chart manages its own certs)
kubectl create namespace spark-operator || true
helm repo add spark-operator https://kubeflow.github.io/spark-operator
helm repo update
helm upgrade --install spark-operator spark-operator/spark-operator \
  -n spark-operator \
  --set spark.jobNamespaces={data-processing}
kubectl rollout status deployment -n spark-operator -l app.kubernetes.io/name=spark-operator

# Job namespace + RBAC for SparkApplications
kubectl create namespace data-processing || true

# Kafka base infrastructure — same Strimzi single-node layout as the
# reference (create-infra.sh:23-26)
kubectl create namespace kafka || true
kubectl apply -f "https://strimzi.io/install/latest?namespace=kafka" -n kafka
kubectl apply -f "https://strimzi.io/examples/latest/kafka/kafka-single-node.yaml" -n kafka
kubectl wait kafka/kafka-cluster --for=condition=Ready --timeout=300s -n kafka || true

echo "infra ready: spark-operator + strimzi kafka"
