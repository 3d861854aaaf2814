package graft.multimodal

/** Common shape of the per-modality decode seams ([[LumaDecoder]] for
  * images, [[PcmDecoder]] for audio): an opaque blob in, the
  * modality's canonical byte signal out. Exists so the query layer
  * threads ANY decoder through one seam-to-column helper
  * (graft.queries.Multimodal.decodedSignal) instead of re-stating the
  * identity-vs-UDF plumbing per operator.
  */
trait BlobDecoder extends Serializable {
  def name: String

  /** Decode an opaque blob into the modality's canonical byte signal.
    * Must be deterministic; throws on malformed input (the caller
    * decides whether to quarantine).
    */
  def decode(blob: Array[Byte]): Array[Byte]
}
