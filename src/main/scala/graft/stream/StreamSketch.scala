package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{CountMin, Hashing}

/** X47 — streaming Count-Min sketch: the X45 sketch maintained
  * INCREMENTALLY over an unbounded event stream. Because the sketch's
  * merge is plain element-wise addition (associative + commutative),
  * it drops into a streaming global aggregate unchanged: each
  * micro-batch folds its rows into partial sketches, the state store
  * holds exactly ONE buffer row (Depth·W longs — constant regardless
  * of stream length or key cardinality), and every trigger emits the
  * sketch-so-far in Complete mode.
  *
  * This is the streaming counterpart of the batch summary family
  * (X45 CMS, B11 HLL): the frequency view of a day's stream costs
  * 32 KiB of state where an exact per-key count grows with the key
  * space. StreamSketchSpec pins stream == batch sketch equality across
  * a micro-batch boundary and the single-state-row property.
  */
object StreamSketch {

  /** Global user-count sketch over a (streaming or batch) events frame. */
  def userSketch(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val cms = udaf(CountMin)
    events
      .select(Hashing.md5Long40($"user_id".cast("string")).as("h"))
      .agg(cms($"h").as("sk"))
  }
}
