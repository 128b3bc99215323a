# App image for the k8s SparkApplications (k8s/spark/*.yaml) and the
# producer deployment: official Spark Python base + this package + the
# Kafka connector jars (which local test environments omit).
ARG SPARK_VERSION=4.1.2
FROM apache/spark:${SPARK_VERSION}-python3

ARG SPARK_VERSION
ARG SCALA_SUFFIX=2.13
USER root

# Kafka connector (spark-sql-kafka) + its runtime deps, resolved once at
# build time into Spark's jars dir so jobs need no --packages at submit.
RUN set -e; cd /opt/spark/jars; \
    for a in spark-sql-kafka-0-10_${SCALA_SUFFIX} spark-token-provider-kafka-0-10_${SCALA_SUFFIX}; do \
      curl -fsSLO "https://repo1.maven.org/maven2/org/apache/spark/${a}/${SPARK_VERSION}/${a}-${SPARK_VERSION}.jar"; \
    done; \
    curl -fsSLO "https://repo1.maven.org/maven2/org/apache/kafka/kafka-clients/3.9.0/kafka-clients-3.9.0.jar"; \
    curl -fsSLO "https://repo1.maven.org/maven2/org/apache/commons/commons-pool2/2.12.0/commons-pool2-2.12.0.jar"

WORKDIR /app
COPY flink_tank_spark /app/flink_tank_spark
ENV PYTHONPATH=/app

USER spark
