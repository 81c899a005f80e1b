package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Multimodal
import graft.sources.Tables

/** Driver-facing multimodal-column queries: binary payloads + metadata →
  * batched per-partition REAL byte-level decode (PPM raster, PV multi-frame
  * video, RIFF/WAVE PCM16) → integer-exact graded features. See
  * [[graft.operators.Multimodal]].
  */
object MediaQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // REAL multi-frame VIDEO container: sequential PV demux (per-frame P6
    // headers locate the frame boundaries), every stride-th frame
    // featurized with integer-exact channel sums
    "media_features" -> ((s, dir) =>
      Multimodal.mediaFeatures(Tables.documents(s, dir))),
    // FRAME DIFFERENCING: per consecutive frame pair, exact sum of
    // absolute byte deltas over the overlapping raster prefix — the
    // scene-change metric video curation computes before frame sampling
    "media_motion" -> ((s, dir) =>
      Multimodal.mediaMotion(Tables.documents(s, dir))),
    "media_frames" -> ((s, dir) =>
      Multimodal.frameSamples(Tables.documents(s, dir))),
    // REAL binary codec end-to-end: synthesized P6 PPM payloads parsed by
    // a genuine header+raster decoder, graded on integer-exact stats
    "media_features_real" -> ((s, dir) =>
      Multimodal.ppmFeatures(Tables.documents(s, dir))),
    // the resize verb: nearest-neighbor 4x4 thumbnail sampled straight
    // from the parsed raster bytes
    "media_thumbs" -> ((s, dir) =>
      Multimodal.ppmThumbs(Tables.documents(s, dir))),
    // the AUDIO modality: synthesized RIFF/WAVE PCM16 payloads parsed by
    // a genuine header+sample decoder, graded on integer-exact stats
    "media_audio" -> ((s, dir) =>
      Multimodal.wavFeatures(Tables.documents(s, dir))),
    // perceptual-hash image dedup: 24-bit dHash over the 4x4 gray thumb,
    // brightness-shift invariance MEASURED, dup group sizes emitted
    "media_phash" -> ((s, dir) =>
      Multimodal.ppmPhash(Tables.documents(s, dir))),
    // image near-dup PAIRS: banded phash LSH + hamming verification -
    // the text dedup machinery re-instantiated on the image modality
    "media_dedup" -> ((s, dir) =>
      Multimodal.ppmPhashPairs(Tables.documents(s, dir))),
    // ViT patchify: the whole-patch grid of the parsed raster, one row
    // per PxP patch with its byte-exact channel checksum
    "media_patches" -> ((s, dir) =>
      Multimodal.ppmPatches(Tables.documents(s, dir))),
    // audio framing: fixed-width int16 frames with exact integer energy
    "media_audio_frames" -> ((s, dir) =>
      Multimodal.wavFrames(Tables.documents(s, dir))),
    // frequency-domain audio: exact integer DFT bin powers (DC / sr/4 /
    // Nyquist) per frame -- the band-energy triple a content filter uses
    "media_audio_spectrum" -> ((s, dir) =>
      Multimodal.wavSpectrum(Tables.documents(s, dir))),
    // STREAMING media ingest: payloads decoded at arrival per micro-batch
    // by the same WAV byte parser; appended features union to exactly the
    // batch decode, graded by media_audio's oracle
    "media_ingest_stream" -> ((s, dir) =>
      graft.streaming.StreamingOps.mediaIngestStream(s, dir))
  )

  val oracles: Map[String, String] = Map(
    "media_features" -> Multimodal.mediaFeaturesSql("documents"),
    "media_motion" -> Multimodal.mediaMotionSql("documents"),
    "media_frames" -> Multimodal.frameSamplesSql("documents"),
    "media_features_real" -> Multimodal.ppmFeaturesSql("documents"),
    "media_thumbs" -> Multimodal.ppmThumbsSql("documents"),
    "media_audio" -> Multimodal.wavFeaturesSql("documents"),
    "media_phash" -> Multimodal.ppmPhashSql("documents"),
    "media_dedup" -> Multimodal.ppmPhashPairsSql("documents"),
    "media_patches" -> Multimodal.ppmPatchesSql("documents"),
    "media_audio_frames" -> Multimodal.wavFramesSql("documents"),
    "media_audio_spectrum" -> Multimodal.wavSpectrumSql("documents"),
    "media_ingest_stream" -> Multimodal.wavFeaturesSql("documents")
  )
}
