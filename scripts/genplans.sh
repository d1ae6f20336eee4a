#!/bin/bash
# Regenerate PLANS.md from the live query plans (run after sbt compile).
/opt/spark/bin/spark-shell --master 'local[8]' \
  --driver-java-options '-Dfile.encoding=UTF-8' \
  --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.extensions=graft.functions.GraftExtensions \
  --conf spark.sql.legacy.parquet.nanosAsLong=true \
  --driver-class-path "$(dirname "$0")/../target/scala-2.13/classes" \
  -I "$(dirname "$0")/genplans.scala"
