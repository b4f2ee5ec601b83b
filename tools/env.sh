# Shared JVM launch environment for the graft mains — sourced by
# verify.sh and determinism.sh so the JDK17 --add-opens list and Spark
# flags stay in lock-step (a package added in one script only would
# leave the other failing with InaccessibleObjectException).
# NOTE: build.sbt carries its own copy of this list (jdk17AddOpens) for
# sbt-forked test/run JVMs — a package added here must be added there
# too, and vice versa.
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
GRAFT_JAVA_FLAGS="-Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
GRAFT_CP="/opt/spark/jars/*:target/scala-2.13/classes"
