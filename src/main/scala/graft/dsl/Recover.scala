package graft.dsl

import org.apache.spark.sql.{Dataset, Encoder}

/** Typed per-record error handling (reference exception handlers,
  * kaflow `applications.py:420-431` + MRO lookup `_consumer.py:192-198`).
  *
  * The reference walks `type(exc).__mro__` to find the nearest registered
  * handler; here handlers are tried in registration order with a subclass
  * check — same "most specific first if you register it first" contract,
  * enforced at registration. Unhandled exceptions re-raise (failing the
  * task → the job), exactly like an unhandled exception crashes the
  * reference's consume loop.
  */
final case class RecoverOut[O](value: Option[O], error: Option[String],
                               errorClass: Option[String])

object Recover {

  /** Map `f` over the dataset; exceptions matched by a registered handler
    * produce a recovery value (or None to drop the record), carrying the
    * error string for DLQ routing. Runs inside mapPartitions — one
    * try/catch per record, no driver round-trips.
    */
  def mapRecover[I, O](ds: Dataset[I])(
      f: I => O,
      handlers: Seq[(Class[_ <: Throwable], Throwable => Option[O])])(
      implicit enc: Encoder[RecoverOut[O]]): Dataset[RecoverOut[O]] = {
    ds.mapPartitions { it =>
      it.map { rec =>
        try RecoverOut[O](Some(f(rec)), None, None)
        catch {
          case e: Throwable =>
            handlers.find(_._1.isAssignableFrom(e.getClass)) match {
              case Some((_, h)) =>
                RecoverOut[O](h(e), Some(String.valueOf(e.getMessage)),
                  Some(e.getClass.getName))
              case None => throw e // unhandled: fail the task (reference semantics)
            }
        }
      }
    }
  }
}
