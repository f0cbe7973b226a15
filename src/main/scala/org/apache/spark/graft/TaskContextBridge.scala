package org.apache.spark.graft

import org.apache.spark.TaskContext

/** Exposes the `protected[spark]` TaskContext propagation to graft's
  * process-script writer thread. Spark's own Python runner does the same
  * from inside the spark package: a helper thread consuming a task's row
  * iterator must carry the task's context so memory accounting and
  * metrics attribute to the right task. */
object TaskContextBridge {
  def set(tc: TaskContext): Unit = TaskContext.setTaskContext(tc)
}
