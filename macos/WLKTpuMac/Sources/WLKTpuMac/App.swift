// WLKTpuMac — native macOS client for the whisperlivekit_tpu server.
// Captures the default microphone with AVAudioEngine, resamples to 16 kHz
// mono s16le, streams it over the `/asr` WebSocket (`--pcm-input` server),
// and renders the incremental FrontData transcript.
//
// Role of reference macos/WhisperLiveKitMac (same wire protocol); written
// for this project with a deliberately small surface: one view model, one
// transport, one capture unit.

import SwiftUI

@main
struct WLKTpuMacApp: App {
    @StateObject private var model = SessionModel()

    var body: some Scene {
        WindowGroup("WhisperLiveKit TPU") {
            SessionView(model: model)
                .frame(minWidth: 560, minHeight: 420)
        }
    }
}
