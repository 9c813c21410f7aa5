package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.util.sketch.BloomFilter

/** Streaming dedup with a HORIZONLESS memory — the state-contract
  * complement of [[DedupStream]] and the streaming face of the p48 bloom
  * prefilter.
  *
  * [[DedupStream]] bounds state by TIME: exact within the watermark
  * horizon, but a duplicate arriving after eviction is re-admitted. This
  * module bounds state by SKETCH SIZE instead: per hash-bucket state is a
  * Bloom filter of every content hash EVER admitted — fixed bytes per
  * bucket FOREVER — so a duplicate is dropped no matter how far apart the
  * copies arrive. The trade flips direction and is inherent to a bloom:
  * NO false negatives (a true duplicate never passes — the sketch
  * membership is a superset of the admitted set) but a false positive
  * drops a genuinely-new document with probability ~fpp. For a
  * training-data feed both directions are benign; choose by which error
  * you'd rather bound: a little redundancy (DedupStream past the
  * horizon) or a little lost coverage (here, fpp-bounded).
  *
  * Admission is deterministic: Spark's `BloomFilter` hashes with fixed
  * seeds, rows admit in doc_id order within a (bucket, micro-batch), and
  * an admitted hash is inserted IMMEDIATELY, so an in-batch duplicate
  * drops exactly like a cross-batch one. On a static DataFrame the same
  * function degrades to one pass over each bucket group under the same
  * admission rule — first arrival wins, and the result equals exact
  * dedup whenever no false positive fires (fpp-bounded there too: a
  * sketch can collide two distinct hashes within one pass).
  *
  * At feed scale: one shuffle on the bucket key per micro-batch; state =
  * `buckets` × (bits/8) bytes total, independent of stream length. Size
  * the geometry from the expected corpus: fp odds stay ≈ fpp while
  * admitted-per-bucket ≤ expectedItemsPerBucket; raise `buckets` (more,
  * smaller sketches — also more shuffle parallelism), not bits, as the
  * corpus grows.
  */
object BloomDedupStream {

  final case class In(bucket: Int, hash: Long, doc_id: Long)
  final case class Admitted(doc_id: Long, content_hash: Long)

  /** Canonical content hash (xxhash64 of p01's canonical text — the
    * sketch key; 64-bit, so hash-collision dedup loss is ~n²/2⁶⁵). */
  def contentHash(textCol: String): org.apache.spark.sql.Column =
    F.xxhash64(F.lower(F.trim(F.col(textCol))))

  def dedupByBloom(docs: DataFrame, textCol: String, idCol: String,
                   buckets: Int = 64,
                   expectedItemsPerBucket: Long = 1L << 16,
                   fpp: Double = 0.01): Dataset[Admitted] = {
    def requireCol(c: String): Unit =
      require(docs.columns.contains(c),
        s"dedupByBloom: input is missing column '$c' (has: ${docs.columns.mkString(", ")})")
    requireCol(textCol); requireCol(idCol)
    require(buckets >= 1, s"dedupByBloom: buckets must be >= 1, got $buckets")
    require(fpp > 0.0 && fpp < 0.5, s"dedupByBloom: fpp must be in (0, 0.5), got $fpp")
    val spark = docs.sparkSession
    import spark.implicits._
    val typed = docs.select(
        F.pmod(contentHash(textCol), F.lit(buckets)).cast("int").as("bucket"),
        contentHash(textCol).as("hash"),
        F.col(idCol).cast("long").as("doc_id"))
      .as[In]
    typed.groupByKey(_.bucket)
      .flatMapGroupsWithState[Array[Byte], Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, it, state) =>
        val bloom = state.getOption match {
          case Some(bytes) =>
            BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
          case None => BloomFilter.create(expectedItemsPerBucket, fpp)
        }
        // doc_id order: the deterministic within-batch admission rule
        val admitted = it.toSeq.sortBy(_.doc_id).flatMap { row =>
          if (bloom.mightContainLong(row.hash)) None
          else { bloom.putLong(row.hash); Some(Admitted(row.doc_id, row.hash)) }
        }
        if (admitted.nonEmpty) {
          val bos = new java.io.ByteArrayOutputStream()
          bloom.writeTo(bos)
          state.update(bos.toByteArray)
        }
        admitted.iterator
      }
  }
}
