package graft.streaming

import java.nio.charset.StandardCharsets

/** Pluggable record serialization for the batching sink — the Spark-side
  * twin of the reference's `ToPutRecordsRequest[A]` typeclass (reference
  * ToPutRecordsRequest.scala): the transport stays agnostic of the
  * element type, users supply (or derive) an instance per payload type.
  */
trait ToRecord[A] extends Serializable {
  def partitionKey(a: A): String
  def payload(a: A): Array[Byte]
}

object ToRecord {
  def apply[A](implicit ev: ToRecord[A]): ToRecord[A] = ev

  def instance[A](key: A => String, bytes: A => Array[Byte]): ToRecord[A] =
    new ToRecord[A] {
      override def partitionKey(a: A): String = key(a)
      override def payload(a: A): Array[Byte] = bytes(a)
    }

  implicit val stringRecord: ToRecord[String] =
    instance(s => s.hashCode.toString, _.getBytes(StandardCharsets.UTF_8))

  implicit val bytesRecord: ToRecord[Array[Byte]] =
    instance(b => java.util.Arrays.hashCode(b).toString, identity)

  /** Keyed payloads shard by their own key. */
  implicit def keyedRecord[V](implicit v: ToRecord[V]): ToRecord[(String, V)] =
    instance(_._1, kv => v.payload(kv._2))
}
